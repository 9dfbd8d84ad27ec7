"""Per-pass decomposition of the int8-QK flash kernel's wall clock.

Times structurally-identical kernel variants with passes removed, at
the production config (5s shape, bq=1536, bk=512, hp=4), to attribute
the measured ~95 vs ~131-ideal TFLOP/s residue to its passes:

  full      QK(s8s8->s32) -> dequant fma -> exp2 -> cast -> PV(bf16)
  no_exp2   QK -> dequant -> cast -> PV          (exp2 removed)
  raw_pv    QK -> cast(bf16) -> PV               (dequant+exp2 removed)
  qk_only   QK -> one slice-cast into acc        (PV matmul removed)

The variants compute garbage — they exist only to time pass subsets;
the deltas between adjacent rows price each pass including its
serialization against the MXU. Run on the TPU:

    timeout 600 python tools/bench_i8_decomp.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kandinsky5_tpu.ops.flash_pallas import _pack_int8

B, S, H, D = 1, 47616, 28, 64
BQ, BK, HP = 1536, 512, 4


def _kernel(q_ref, k_ref, v_ref, aux_ref, o_ref, acc_ref, *,
            num_k: int, mode: str):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for h in range(HP):
        s32 = jax.lax.dot_general(
            q_ref[h], k_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if mode == "qk_only":
            # touch all of s32 cheaply: one lane-slice cast-accumulate
            acc_ref[h] += s32[:, :128].astype(jnp.float32)
            continue
        if mode == "raw_pv":
            p = s32.astype(v_ref.dtype)
        else:
            c = aux_ref[h, 0:1, :]
            bsh = aux_ref[h, 1:2, :]
            s = s32.astype(jnp.float32) * c - bsh
            if mode == "no_exp2":
                p = s.astype(v_ref.dtype)
            else:  # full
                p = jnp.exp2(s).astype(v_ref.dtype)
        acc_ref[h] += jax.lax.dot_general(
            p, v_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_k - 1)
    def _fin():
        for h in range(HP):
            o_ref[h] = acc_ref[h][:, :64].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(q8, k8, va, aux, mode: str):
    bh, lq, d = q8.shape
    lk = k8.shape[2]
    num_k = lk // BK
    grid = (bh // HP, lq // BQ, num_k)
    return pl.pallas_call(
        functools.partial(_kernel, num_k=num_k, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((HP, BQ, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, d, BK), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, BK, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, 8, BK), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HP, BQ, 64), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, 64), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((HP, BQ, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q8, k8, va, aux)


def main():
    def rmsnorm(x):
        return x / jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = rmsnorm(jax.random.normal(ks[0], (B, S, H, D))).astype(jnp.bfloat16)
    k = rmsnorm(jax.random.normal(ks[1], (B, S, H, D))).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    q8, k8, va, aux, _ = _pack_int8(qf, kf, vf, D)
    flops = 4 * S * S * D * H * B

    def sync(x):
        return float(jnp.sum(x[0, 0, :1].astype(jnp.float32)))

    rows = []
    for mode in ("full", "no_exp2", "raw_pv", "qk_only"):
        sync(run(q8, k8, va, aux, mode))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                r = run(q8, k8, va, aux, mode)
            sync(r)
            best = min(best, (time.perf_counter() - t0) / 4)
        rows.append((mode, best))
        print(f"  {mode:9s}: {best*1e3:8.2f} ms  "
              f"{flops/best/1e12:6.1f} TFLOP/s-equivalent")
    t = dict(rows)
    print(f"  exp2 pass cost:     {(t['full']-t['no_exp2'])*1e3:7.2f} ms")
    print(f"  dequant fma cost:   {(t['no_exp2']-t['raw_pv'])*1e3:7.2f} ms")
    print(f"  PV matmul cost:     {(t['raw_pv']-t['qk_only'])*1e3:7.2f} ms")
    print(f"  QK+cast floor:      {t['qk_only']*1e3:7.2f} ms")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
