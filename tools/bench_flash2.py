"""Flash kernel sweep: block shapes at the 5s production shape."""

import functools
import itertools
import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :1].astype(jnp.float32)))


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
    from kandinsky5_tpu.ops import flash_pallas as fp

    B, S, H, D = 1, 47616, 28, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    flops = 4 * S * S * D * H * B

    for bq, bk in itertools.product((1536, 2976, 5952), (512, 1024, 1536)):
        if S % bq:
            continue
        f = jax.jit(functools.partial(
            fp.flash_attention, block_q=bq, block_k=bk))
        try:
            t = timeit(f, q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}: FAIL {type(e).__name__}: {e}"[:120])
            continue
        print(f"bq={bq} bk={bk}: {t*1e3:8.1f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
