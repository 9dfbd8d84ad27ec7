"""Prototype: can a Pallas GEMM beat XLA on the two priced block
components the round-5 decomposition left open?

1. The SERIAL out-projection (47616x1792)@(1792x1792) — XLA pins it at
   65-67 TF/s in every formulation (recorded negative, commit 44489dd)
   while independent GEMMs overlap to 123-135.  Hypothesis: a Pallas
   row-block kernel with the weight resident in VMEM software-pipelines
   the row tiles and is not subject to whatever scheduling pins the
   serial XLA GEMM.
2. The FEED-FORWARD x@W1 -> gelu -> @W2 chain — XLA runs it at
   134.7 TF/s; a fused kernel avoids the 650 MB hidden-activation HBM
   round-trip and keeps both weights resident.

Measured as n-deep jitted chains exactly like tools/bench_block_decomp
so numbers are comparable.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pallas_gemm.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, FF, S = 1792, 7168, 47616
BF = jnp.bfloat16


# ---------------------------------------------------------------------------
# Plain row-block GEMM: y[bs, D] = x[bs, D] @ w[D, N]
# ---------------------------------------------------------------------------

def _gemm_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(
        x_ref[...], w_ref[...],
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_gemm(x, w, bs=512):
    s, d = x.shape
    n = w.shape[1]
    grid = (s // bs,)
    return pl.pallas_call(
        _gemm_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w)


# ---------------------------------------------------------------------------
# Fused FF: y = gelu(x @ w1) @ w2, hidden never leaves VMEM
# ---------------------------------------------------------------------------

def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 < bf16 ulp); Mosaic
    has no erf/erfc lowering, so evaluate in fp32 in-kernel."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact_f32(h):
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))


def _ff_kernel(x_ref, w1_ref, w2_ref, o_ref):
    h = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)
    h = _gelu_exact_f32(h).astype(x_ref.dtype)
    o_ref[...] = jnp.dot(
        h, w2_ref[...],
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_ff(x, w1, w2, bs=256):
    """Both weights VMEM-resident (51.4 MB) — needs a raised scoped-vmem
    limit; v5e has 128 MiB."""
    s, d = x.shape
    ff = w1.shape[1]
    grid = (s // bs,)
    return pl.pallas_call(
        _ff_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, ff), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ff, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1, w2)


# ---------------------------------------------------------------------------
# Tiled fused FF: grid over (rows, ff-chunks); per-chunk partial hidden ->
# gelu -> partial second GEMM accumulated in an fp32 VMEM scratch.  Weight
# chunks stream through VMEM (double-buffered by the grid pipeline), so no
# raised vmem limit needed.
# ---------------------------------------------------------------------------

def _ff_tiled_kernel(x_ref, w1_ref, w2_ref, o_ref, acc_ref):
    j = pl.program_id(1)
    h = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)
    h = _gelu_exact_f32(h).astype(x_ref.dtype)
    part = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_ff_tiled(x, w1, w2, bs=256, bf=1024):
    s, d = x.shape
    ff = w1.shape[1]
    grid = (s // bs, ff // bf)
    return pl.pallas_call(
        _ff_tiled_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bs, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, bf), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bf, d), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((bs, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1, w2)


def timed_chain(fn, x0, n, label, flops):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        for _ in range(n):
            x = fn(x)
        return x

    chain(x0, n).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        chain(x0, n).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"  {label:<34s} {best * 1e3:7.2f} ms, "
          f"{flops / best / 1e12:.1f} TF/s", flush=True)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (S, D), BF)
    wo = jax.random.normal(k[1], (D, D), BF) * 0.02
    w1 = jax.random.normal(k[2], (D, FF), BF) * 0.02
    w2 = jax.random.normal(k[3], (FF, D), BF) * 0.02

    out_flops = 2 * S * D * D
    ff_flops = 2 * S * D * FF * 2

    # correctness first (bf16 tolerance)
    y_ref = (x @ wo).astype(BF)
    y_pl = pallas_gemm(x, wo)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_pl.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) or 1.0
    print(f"gemm relmax err {err / scale:.2e}")
    h_ref = jax.nn.gelu((x @ w1).astype(jnp.float32),
                        approximate=False).astype(BF)
    f_ref = (x.astype(jnp.float32) @ w1.astype(jnp.float32))
    f_ref = jax.nn.gelu(f_ref, approximate=False).astype(BF)
    f_ref = (f_ref @ w2).astype(BF)
    for name, fn in [("resident", pallas_ff), ("tiled", pallas_ff_tiled)]:
        try:
            f_pl = fn(x, w1, w2)
        except Exception as e:
            print(f"ff {name} FAILS: {str(e)[:160]}")
            continue
        errf = float(jnp.max(jnp.abs(f_ref.astype(jnp.float32)
                                     - f_pl.astype(jnp.float32))))
        scf = float(jnp.max(jnp.abs(f_ref.astype(jnp.float32)))) or 1.0
        print(f"ff {name} relmax err {errf / scf:.2e}")

    print("[serial out-proj GEMM]", flush=True)
    timed_chain(lambda v: (v @ wo).astype(BF), x, 8, "XLA x@wo", out_flops)
    for bs in (256, 512, 768, 1536, 3072):   # 47616 = 93*512 = 62*768 = 31*1536
        if S % bs:
            continue
        timed_chain(lambda v, b=bs: pallas_gemm(v, wo, bs=b), x, 8,
                    f"pallas bs={bs}", out_flops)

    print("[feed-forward chain]", flush=True)

    def xla_ff(v):
        h = (v @ w1)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(BF)
        return (h @ w2).astype(BF)

    timed_chain(xla_ff, x, 6, "XLA gemm-gelu-gemm", ff_flops)
    for bs in (128, 256, 512):
        try:
            timed_chain(lambda v, b=bs: pallas_ff(v, w1, w2, bs=b), x, 6,
                        f"pallas fused resident bs={bs}", ff_flops)
        except Exception as e:
            print(f"  resident bs={bs} FAILS: {str(e)[:120]}")
    for bs in (256, 512, 768, 1536):
        for bf in (2048, 3584):
            try:
                timed_chain(
                    lambda v, b=bs, f=bf: pallas_ff_tiled(v, w1, w2, bs=b, bf=f),
                    x, 6, f"pallas fused tiled bs={bs} bf={bf}", ff_flops)
            except Exception as e:
                print(f"  tiled bs={bs} bf={bf} FAILS: {str(e)[:120]}")


if __name__ == "__main__":
    main()
