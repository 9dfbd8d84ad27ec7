"""Bench one flash block-shape variant (subprocess-friendly so a hung
compile can be timed out without losing other variants).

Usage: python tools/bench_flash_one.py BQ BK [--seq N]
"""

import sys
import time

import numpy as np  # noqa: F401

import jax
import jax.numpy as jnp


def main():
    bq, bk = int(sys.argv[1]), int(sys.argv[2])
    S = 47616
    if "--seq" in sys.argv:
        S = int(sys.argv[sys.argv.index("--seq") + 1])
    splits = 2
    if "--splits" in sys.argv:
        splits = int(sys.argv[sys.argv.index("--splits") + 1])

    import functools

    import kandinsky5_tpu  # noqa: F401
    from kandinsky5_tpu.ops import flash_pallas as fp

    B, H, D = 1, 28, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    flops = 4 * S * S * D * H * B

    def sync(x):
        return float(jnp.sum(x[0, 0, 0, :1].astype(jnp.float32)))

    f = jax.jit(functools.partial(fp.flash_attention, block_q=bq, block_k=bk,
                                  splits=splits))
    t0 = time.perf_counter()
    sync(f(q, k, v))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(q, k, v))
        best = min(best, time.perf_counter() - t0)
    print(f"bq={bq} bk={bk} sp={splits} S={S}: {best*1e3:8.1f} ms "
          f"{flops/best/1e12:6.1f} TFLOP/s (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
