"""Per-shape conv3d rates at the VAE stream-decoder's dominant shapes.

The roofline (tools/roofline.py) puts the streaming decode at ~49% of
the MXU floor; this probe shows whether the gap is the convs themselves
(XLA's NDHWC conv3d lowering) or the orchestration around them
(GN/SiLU passes, upsample materialization, per-chunk dispatch).

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_vae_convs.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

# (T, H, W, Cin, Cout, count_in_full_decode) — stream chunks decode
# chunk_lat=3 latent frames -> T~13 pixel frames at full res; counts
# aggregate the whole 5s video (see tools/roofline.py stage walk)
SHAPES = [
    # up3 resnets at full res (the FLOP bulk)
    (13, 512, 768, 256, 128, 9.3),     # first resnet conv1 (x31/13 chunks)
    (13, 512, 768, 128, 128, 46.5),    # remaining full-res convs
    # up2 + upsample at half res
    (7, 256, 384, 512, 256, 9.3),
    (7, 256, 384, 256, 256, 37),
    # latent-res 512ch stages (mid + up0/up1)
    (4, 128, 192, 512, 512, 30),
    (4, 64, 96, 512, 512, 40),
]


def _sync(y):
    # the tunneled PJRT plugin's block_until_ready returns early; a
    # host transfer is the reliable fence (same as tools/bench_flash_i8)
    return float(jnp.sum(y[0, 0, 0, :1].astype(jnp.float32)))


def bench_conv(t, h, w, cin, cout, iters=8):
    x = jnp.asarray(np.random.RandomState(0).randn(1, t, h, w, cin),
                    jnp.bfloat16)
    wgt = jnp.asarray(
        np.random.RandomState(1).randn(3, 3, 3, cin, cout) * 0.02,
        jnp.bfloat16)

    @jax.jit
    def f(x, wgt):
        return jax.lax.conv_general_dilated(
            x, wgt, window_strides=(1, 1, 1), padding=[(2, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    _sync(f(x, wgt))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = f(x, wgt)
    _sync(y)
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * t * h * w * cin * cout * 27
    return dt, flops / dt / 1e12


def main():
    print(f"devices: {jax.devices()}")
    total_t, total_f = 0.0, 0.0
    for t, h, w, cin, cout, count in SHAPES:
        dt, rate = bench_conv(t, h, w, cin, cout)
        flops = 2 * t * h * w * cin * cout * 27
        total_t += dt * count
        total_f += flops * count
        print(f"({t},{h},{w}) {cin}->{cout}: {dt*1e3:7.2f} ms, "
              f"{rate:6.1f} TFLOP/s  (x{count})")
    print(f"\nconv-only aggregate: {total_t:.2f} s at "
          f"{total_f/total_t/1e12:.1f} TFLOP/s "
          f"({total_f/1e12:.0f} TF)")


if __name__ == "__main__":
    main()
