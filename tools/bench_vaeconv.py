"""Microbenchmark: VAE decoder conv variants at the 5s decode tile shapes.

Dominant decoder stages at 768x512x17-frame tiles (after each upsample):
  up0/up1 resnets: (1, 9, 128, 192, 512) -> 512, k=3x3x3
  up2 resnets:     (1, 17, 256, 384, 256) -> 256
  up3 resnets:     (1, 17, 512, 768, 128) -> 128
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x[0, 0, 0, 0, :1].astype(jnp.float32)))


def timeit(f, *args, reps=3):
    sync(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def conv3d_ndhwc(x, w, b):
    kt, kh, kw = w.shape[:3]
    xp = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                     (kw // 2, kw // 2), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return (y + b).astype(x.dtype)


def conv3d_nopad(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return (y + b).astype(x.dtype)


def conv3d_as2d(x, w, b):
    """Decompose kT=3 causal conv3d into one 2D conv on time-shifted
    channel-concat input: y[t] = sum_dt conv2d(x[t+dt-2], w[dt])."""
    kt = w.shape[0]
    bsz, t, h, wd, c = x.shape
    shifts = [jnp.concatenate([jnp.repeat(x[:, :1], kt - 1 - dt, 1),
                               x[:, :t - (kt - 1 - dt)]], 1)
              for dt in range(kt)]
    xc = jnp.concatenate(shifts, axis=-1)  # (B, T, H, W, kt*C)
    xc = xc.reshape(bsz * t, h, wd, kt * c)
    w2 = w.transpose(1, 2, 0, 3, 4).reshape(w.shape[1], w.shape[2],
                                            kt * c, w.shape[4])
    y = jax.lax.conv_general_dilated(
        xc, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y.reshape(bsz, t, h, wd, -1) + b).astype(x.dtype)


def conv3d_bf16acc(x, w, b):
    kt, kh, kw = w.shape[:3]
    xp = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                     (kw // 2, kw // 2), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b.astype(y.dtype)


def main():
    import kandinsky5_tpu  # noqa: F401

    shapes = [
        ("up0", (1, 9, 128, 192, 512), 512),
        ("up2", (1, 17, 256, 384, 256), 256),
        ("up3", (1, 17, 512, 768, 128), 128),
    ]
    for name, xs, cout in shapes:
        cin = xs[-1]
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, xs, jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16)
             * 0.02)
        b = jnp.zeros((cout,), jnp.float32)
        voxels = np.prod(xs[:4])
        flops = 2 * voxels * cin * cout * 27
        for label, fn in [("ndhwc+pad", conv3d_ndhwc),
                          ("nopad", conv3d_nopad),
                          ("as2d", conv3d_as2d),
                          ("bf16acc", conv3d_bf16acc)]:
            f = jax.jit(fn)
            try:
                t = timeit(f, x, w, b)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label}: FAIL {type(e).__name__}: {e}"[:120])
                continue
            print(f"{name} {label:10s}: {t*1e3:7.1f} ms "
                  f"{flops/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
