"""Isolate the causal-conv pad cost: pad alone, conv on pre-padded,
fused zero-pad conv, and GroupNorm cost at the up3 decode shape."""

import time

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

    xs, cout = (1, 17, 512, 768, 128), 128
    cin = xs[-1]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, xs, jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02
    b = jnp.zeros((cout,), jnp.float32)

    import numpy as np
    voxels = np.prod(xs[:4])
    flops = 2 * voxels * cin * cout * 27

    def pad_only(x):
        return jnp.pad(x, ((0, 0), (2, 0), (1, 1), (1, 1), (0, 0)),
                       mode="edge")

    t = timeit(jax.jit(pad_only), x)
    print(f"pad_only      : {t*1e3:7.1f} ms")

    xp = jax.jit(pad_only)(x)

    def conv_valid(xp):
        y = jax.lax.conv_general_dilated(
            xp, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return (y + b).astype(xp.dtype)

    t = timeit(jax.jit(conv_valid), xp)
    print(f"conv_prepadded: {t*1e3:7.1f} ms {flops/t/1e12:6.1f} TFLOP/s")

    def conv_zeropad(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(2, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    t = timeit(jax.jit(conv_zeropad), x)
    print(f"conv_zeropad  : {t*1e3:7.1f} ms {flops/t/1e12:6.1f} TFLOP/s")

    def gn(x):
        return group_norm({"weight": jnp.ones((cin,), jnp.bfloat16),
                           "bias": jnp.zeros((cin,), jnp.bfloat16)}, x)

    t = timeit(jax.jit(gn), x)
    print(f"group_norm    : {t*1e3:7.1f} ms")

    def gn_silu(x):
        h = gn(x)
        return jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)

    t = timeit(jax.jit(gn_silu), x)
    print(f"gn+silu       : {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
