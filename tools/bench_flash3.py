"""Round-3 flash sweep: in-kernel normalize epilogue variants.

Measures norm mode x heads-per-program x block shape at the 5s
production shape (47,616 tokens, 28 heads, d=64). Run on the TPU:

    timeout 3000 python tools/bench_flash3.py [quick]
"""

import functools
import sys
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
    from kandinsky5_tpu.ops import flash_pallas as fp

    B, S, H, D = 1, 47616, 28, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    flops = 4 * S * S * D * H * B

    quick = "quick" in sys.argv[1:]
    if quick:
        cases = [
            ("ext", None, 1488, 768, False, False),
            ("in", None, 1488, 768, False, False),
            ("in_wide", None, 1488, 768, False, False),
            ("in", 4, 1488, 768, False, False),
        ]
    else:
        # round 2 of the sweep: exp2-at-bf16 (halve the VPU pass between
        # the matmuls), more heads per program, kv block widths (must be
        # 128-multiples: Mosaic requires lane-dim % 128)
        # round 3 of the sweep: head-interleaved QK issue (hide the
        # exp2 VPU pass behind the next head's QK on the MXU)
        cases = [
            ("in", 4, 1488, 768, False, True),
            ("in", 2, 1488, 768, False, True),
            ("in", 4, 1488, 768, True, True),
            ("in", 4, 1488, 768, False, False),  # control
        ]
    for norm, hp, bq, bk, eb, il in cases:
        if S % bq:
            print(f"skip bq={bq} (not a divisor)")
            continue
        f = jax.jit(functools.partial(
            fp.flash_attention, block_q=bq, block_k=bk, norm=norm,
            hp_opt=hp, exp_bf16=eb, interleave=il))
        try:
            t = timeit(f, q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"norm={norm} hp={hp} bq={bq} bk={bk} eb={eb} il={il}: "
                  f"FAIL {type(e).__name__}: {e}"[:160], flush=True)
            continue
        print(f"norm={norm:8s} hp={hp} bq={bq} bk={bk} eb={int(eb)} "
              f"il={int(il)}: {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
