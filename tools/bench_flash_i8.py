"""int8-QK flash kernel: accuracy + rate vs the bf16 fixed-shift kernel.

Inputs mimic the DiT's attention inputs: QK-RMSNorm'd (unit-rms rows)
+ RoPE-rotated, which is the regime the quantization error story
assumes. Run on the TPU:

    timeout 3000 python tools/bench_flash_i8.py [quick]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :1].astype(jnp.float32)))


def timeit(f, *args, reps=3, inner=4, **kw):
    sync(f(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = f(*args, **kw)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best / inner


def rmsnorm(x):
    return x / jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))


def main():
    from kandinsky5_tpu.ops.attention import dense_attention
    from kandinsky5_tpu.ops.flash_pallas import flash_attention

    quick = "quick" in sys.argv[1:]
    B, S, H, D = 1, 4096 if quick else 47616, 28, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = rmsnorm(jax.random.normal(ks[0], (B, S, H, D))).astype(jnp.bfloat16)
    k = rmsnorm(jax.random.normal(ks[1], (B, S, H, D))).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    flops = 4 * S * S * D * H * B

    # accuracy at a small shape (dense reference fits)
    Sa = 2048
    qa, ka, va = q[:, :Sa], k[:, :Sa], v[:, :Sa]
    ref = np.asarray(dense_attention(qa, ka, va), np.float32)
    for name, kw in [("bf16", {}), ("int8", dict(qk_int8=True)),
                     ("int8+ebf16", dict(qk_int8=True, exp_bf16=True)),
                     ("int8pv", dict(pv_int8=True))]:
        out = np.asarray(
            flash_attention(qa, ka, va, **kw), np.float32)
        err = np.abs(out - ref)
        rel = err.max() / np.abs(ref).max()
        print(f"  acc {name}: max_abs {err.max():.5f}  mean_abs "
              f"{err.mean():.6f}  rel_max {rel:.5f}")

    cases = [("bf16", {}),
             ("int8 1536/768", dict(qk_int8=True)),
             ("int8+ebf16 1536/768", dict(qk_int8=True, exp_bf16=True)),
             ("int8+ebf16 1536/1152", dict(qk_int8=True, exp_bf16=True,
                                           block_k=1152)),
             ("int8+ebf16 2048/768", dict(qk_int8=True, exp_bf16=True,
                                          block_q=2048)),
             ("int8 1536/1152", dict(qk_int8=True, block_k=1152)),
             ("int8 1536/1536", dict(qk_int8=True, block_k=1536)),
             ("int8 1024/1024", dict(qk_int8=True, block_q=1024,
                                     block_k=1024)),
             ("int8 2048/768", dict(qk_int8=True, block_q=2048)),
             ("int8 3072/768", dict(qk_int8=True, block_q=3072)),
             ("int8pv 1536/768", dict(pv_int8=True)),
             ("int8pv 1536/1152", dict(pv_int8=True, block_k=1152)),
             ("int8pv 1536/1536", dict(pv_int8=True, block_k=1536)),
             ("int8pv 2048/1024", dict(pv_int8=True, block_q=2048,
                                       block_k=1024)),
             ("int8pv 3072/768", dict(pv_int8=True, block_q=3072)),
             # lag-1 kv-block pipeline (round-5 measured NEGATIVE at
             # every block config; see flash_pallas module docstring)
             ("int8pipe 1536/512", dict(qk_int8=True, pipe=True)),
             ("int8pipe 1536/512 ebf16", dict(qk_int8=True, pipe=True,
                                              exp_bf16=True))]
    for name, kw in cases:
        try:
            t = timeit(flash_attention, q, k, v, **kw)
            print(f"  rate {name}: {t*1e3:9.2f} ms   "
                  f"{flops/t/1e12:6.1f} TFLOP/s useful")
        except Exception as e:
            print(f"  rate {name}: FAILED {type(e).__name__}: {str(e)[:120]}")

    # artifact-free production view: the pack runs INSIDE the jit (as in
    # the denoise graph); the standalone calls above pay an eager-pack
    # dispatch overhead (~27 ms at the 5s shape) production never sees
    for name, kw in [("bf16", {}), ("int8", dict(qk_int8=True))]:
        f = jax.jit(lambda q, k, v, kw=kw: flash_attention(q, k, v, **kw))
        t = timeit(f, q, k, v)
        print(f"  rate jit({name}): {t*1e3:9.2f} ms   "
              f"{flops/t/1e12:6.1f} TFLOP/s useful")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
