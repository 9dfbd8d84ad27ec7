"""Calibrated microbench: run each op N times inside ONE execution to
remove the ~30ms tunnel round-trip floor. Reports per-op ms."""

import time

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 8


def timeit_loop(make_f, x, iters=ITERS, reps=3):
    f = make_f()

    @jax.jit
    def many(x):
        def body(i, acc):
            y = f(x + i.astype(x.dtype))
            idx = (0,) * (y.ndim - 1) + (slice(0, 1),)
            return acc + jnp.sum(y[idx].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(many(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import kandinsky5_tpu  # noqa: F401
    from kandinsky5_tpu.models.vae import group_norm

    # floor: sync-only
    tiny = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        float(jnp.sum(tiny[0, :1]))
    floor = (time.perf_counter() - t0) / 5
    print(f"sync floor: {floor*1e3:6.1f} ms")

    xs = (1, 17, 512, 768, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
    c_ = xs[-1]

    gb = np.prod(xs) * 2 / 1e9
    t = timeit_loop(lambda: (lambda v: v * 1.5), x)
    print(f"copy(x*1.5) : {t*1e3:7.1f} ms  {2*gb/t:6.0f} GB/s")

    t = timeit_loop(lambda: (lambda v: jnp.pad(
        v, ((0, 0), (2, 0), (1, 1), (1, 1), (0, 0)), mode='edge')), x)
    print(f"pad_edge    : {t*1e3:7.1f} ms  {2*gb/t:6.0f} GB/s")

    p = {"weight": jnp.ones((c_,), jnp.bfloat16),
         "bias": jnp.zeros((c_,), jnp.bfloat16)}
    t = timeit_loop(lambda: (lambda v: group_norm(p, v)), x)
    print(f"group_norm  : {t*1e3:7.1f} ms  {3*gb/t:6.0f} GB/s")

    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c_, c_),
                          jnp.bfloat16) * 0.02
    flops = 2 * np.prod(xs[:4]) * c_ * c_ * 27

    def conv_pad(v):
        vp = jnp.pad(v, ((0, 0), (2, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return jax.lax.conv_general_dilated(
            vp, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(v.dtype)

    t = timeit_loop(lambda: conv_pad, x, iters=4)
    print(f"conv+pad    : {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} TFLOP/s")

    def conv_zero(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1, 1), [(2, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(v.dtype)

    t = timeit_loop(lambda: conv_zero, x, iters=4)
    print(f"conv_zeropad: {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} TFLOP/s")

    def resnet_like(v):
        h = group_norm(p, v)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(v.dtype)
        return conv_pad(h)

    t = timeit_loop(lambda: resnet_like, x, iters=4)
    print(f"gn+silu+conv: {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
