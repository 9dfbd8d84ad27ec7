"""Probe: does decomposing the causal conv3d into 3 time-tap 2D convs
beat XLA's 3D lowering at the VAE decoder's dominant shape?

The (13,512,768) 128->128 conv runs at 88.4 TFLOP/s as a 3D conv
(tools/bench_vae_convs.py) while neighboring shapes reach 110-125.
conv3d(k=3x3x3) == sum over dt of conv2d(x[t+dt-2], W[dt]) with
causal padding; if XLA's 2D lowering is faster, the decomposition
wins despite reading x three times (bandwidth is not the wall here).

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_conv_decomp.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(y):
    return float(jnp.sum(y[0, 0, 0, :1].astype(jnp.float32)))


T, H, W, CIN, COUT = 13, 512, 768, 128, 128
FLOPS = 2 * T * H * W * CIN * COUT * 27


def conv3d(x, wgt):
    return jax.lax.conv_general_dilated(
        x, wgt, (1, 1, 1), [(2, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_as_2d(x, wgt):
    """Sum of 3 spatial 2D convs over the causal time taps.
    x: (B, T, H, W, C); wgt: (3, 3, 3, CIN, COUT). Fold T into the
    conv batch dim; tap dt consumes x frames [t-2+dt] (causal pad 2)."""
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
    acc = None
    for dt in range(3):
        xs = xp[:, dt:dt + t].reshape(b * t, h, w, c)
        y = jax.lax.conv_general_dilated(
            xs, wgt[dt], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = y if acc is None else acc + y
    return acc.reshape(b, t, h, w, -1)


def bench(f, x, wgt, iters=8):
    jf = jax.jit(f)
    _sync(jf(x, wgt))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = jf(x, wgt)
    _sync(y)
    return (time.perf_counter() - t0) / iters


SHAPES = [
    (13, 512, 768, 256, 128, 9.3),
    (13, 512, 768, 128, 128, 46.5),
    (7, 256, 384, 512, 256, 9.3),
    (7, 256, 384, 256, 256, 37),
    (4, 128, 192, 512, 512, 30),
    (4, 64, 96, 512, 512, 40),
]


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)

    # numerics once at the headline shape
    x = jnp.asarray(rng.randn(1, T, H, W, CIN), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, 3, CIN, COUT) * 0.05, jnp.bfloat16)
    y3 = np.asarray(conv3d(x, wgt)[0, :, :4, :4, :2], np.float32)
    y2 = np.asarray(conv3d_as_2d(x, wgt)[0, :, :4, :4, :2], np.float32)
    err = np.abs(y3 - y2).max() / max(np.abs(y3).max(), 1e-6)
    print(f"decomposition rel err: {err:.5f}")

    tot3 = tot2 = 0.0
    for t, h, w, cin, cout, count in SHAPES:
        x = jnp.asarray(rng.randn(1, t, h, w, cin), jnp.bfloat16)
        wgt = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.05, jnp.bfloat16)
        flops = 2 * t * h * w * cin * cout * 27
        d3 = bench(conv3d, x, wgt)
        d2 = bench(conv3d_as_2d, x, wgt)
        tot3 += d3 * count
        tot2 += d2 * count
        print(f"({t},{h},{w}) {cin}->{cout}: 3d {flops/d3/1e12:6.1f} "
              f"vs 2dx3 {flops/d2/1e12:6.1f} TFLOP/s  (x{count})")
    print(f"\naggregate: conv3d {tot3:.2f} s vs 3x-conv2d {tot2:.2f} s")


if __name__ == "__main__":
    main()
