"""Microbenchmark: flash attention kernel at production shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_flash.py
Reports TFLOP/s per variant (attention flops = 4*S*S*D per head).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :1].astype(jnp.float32)))


def timeit(f, *args, reps=3):
    out = f(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=47616)
    ap.add_argument("--heads", type=int, default=28)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import kandinsky5_tpu  # noqa: F401  compile cache
    from kandinsky5_tpu.ops import flash_pallas as fp

    B, S, H, D = args.batch, args.seq, args.heads, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    flops = 4 * S * S * D * H * B

    import functools
    import itertools

    for bq, bk in itertools.product((256, 512, 1024), (512, 1024, 2048)):
        if S % bq or S % bk:
            continue
        f = jax.jit(functools.partial(
            fp.flash_attention, block_q=bq, block_k=bk))
        try:
            t = timeit(f, q, k, v, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}: FAIL {type(e).__name__}")
            continue
        print(f"bq={bq} bk={bk}: {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
