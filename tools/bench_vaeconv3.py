"""Pad strategies + new group_norm at the up3 decode shape."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    idx = (0,) * (x.ndim - 1) + (slice(0, 1),)
    return float(jnp.sum(x[idx].astype(jnp.float32)))


def timeit(f, *args, reps=3):
    sync(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import kandinsky5_tpu  # noqa: F401
    from kandinsky5_tpu.models.vae import group_norm

    xs = (1, 17, 512, 768, 128)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, xs, jnp.bfloat16)
    _, t_, h_, w_, c_ = xs

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)), mode="edge")

    def pad_h(x):
        return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")

    def pad_w(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")

    for name, f in [("pad_t", pad_t), ("pad_h", pad_h), ("pad_w", pad_w)]:
        print(f"{name}: {timeit(jax.jit(f), x)*1e3:7.1f} ms")

    # one-gather pad: flat clamped THW index
    ti = np.clip(np.arange(t_ + 2) - 2, 0, t_ - 1)
    hi = np.clip(np.arange(h_ + 2) - 1, 0, h_ - 1)
    wi = np.clip(np.arange(w_ + 2) - 1, 0, w_ - 1)
    flat = (ti[:, None, None] * h_ * w_ + hi[None, :, None] * w_
            + wi[None, None, :]).reshape(-1).astype(np.int32)
    flat_j = jnp.asarray(flat)

    def pad_gather(x):
        xf = x.reshape(1, t_ * h_ * w_, c_)
        return jnp.take(xf, flat_j, axis=1).reshape(
            1, t_ + 2, h_ + 2, w_ + 2, c_)

    print(f"pad_gather: {timeit(jax.jit(pad_gather), x)*1e3:7.1f} ms")

    p = {"weight": jnp.ones((c_,), jnp.bfloat16),
         "bias": jnp.zeros((c_,), jnp.bfloat16)}
    print(f"group_norm_new: {timeit(jax.jit(lambda x: group_norm(p, x)), x)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
