"""Fused feed-forward Pallas kernel: gelu(x @ W1) @ W2 in one pass.

The reference runs the DiT FeedForward as two torch Linears around an
exact GELU (/root/reference/kandinsky/models/nn.py:352-361). On TPU the
XLA decomposition round-trips the (rows, 7168) hidden activation through
HBM between the two GEMMs and runs the chain at ~126 TF/s at the 5s
block shape. This kernel tiles rows x ff-chunks on a Pallas grid, keeps
the hidden tile in VMEM (gelu applied in fp32 on the MXU accumulator),
and accumulates the second GEMM's partial products in an fp32 VMEM
scratch: measured 155.2 TF/s vs 126.4 XLA at (47616, 1792, 7168) on
v5e (tools/bench_pallas_gemm.py), ~2.4 ms/block less.

GELU note: Mosaic has no erf/erfc lowering, so the kernel evaluates
Abramowitz-Stegun 7.1.26 in fp32 (max abs err 1.5e-7 — below bf16 ulp,
so the bf16-cast hidden is indistinguishable from exact GELU; the fp32
accumulation makes the fused path strictly *more* accurate than the
XLA bf16 chain it replaces). Opt out: KANDINSKY5_TPU_FUSED_FF=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BS = 512          # row tile (47616 = 93*512; remainders are padded)
_BF_TARGET = 2048  # ff-chunk tile (best of the v5e sweep)


def _erf_f32(x):
    """A&S 7.1.26 erf, fp32 (max abs err 1.5e-7 < bf16 ulp)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact_f32(h):
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))


def _ff_kernel(x_ref, w1_ref, w2_ref, o_ref, acc_ref):
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


def _ff_mod_kernel(x_ref, sc_ref, sh_ref, g_ref, w1_ref, w2_ref,
                   o_ref, acc_ref, xn_ref, *, ln_eps: float, gate: bool):
    """Modulated FF: AdaLN scale-shift-norm folded into the input map
    (computed once per row tile, reused across ff chunks) and the
    gate+residual folded into the epilogue — the normed and gated
    activations never round-trip HBM (models/nn.py apply_scale_shift_
    norm / apply_gate_sum; reference nn.py:25-33)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _norm():
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
        y = y * (sc_ref[...].astype(jnp.float32) + 1.0) \
            + sh_ref[...].astype(jnp.float32)
        xn_ref[...] = y.astype(xn_ref.dtype)

    h = jnp.dot(xn_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)
    h = _gelu_exact_f32(h).astype(xn_ref.dtype)
    part = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == pl.num_programs(2) - 1)
    def _emit():
        if gate:
            o_ref[0] = (x_ref[0].astype(jnp.float32)
                        + g_ref[...].astype(jnp.float32) * acc_ref[...]
                        ).astype(o_ref.dtype)
        else:
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _pick_bf(ff: int) -> int:
    """Largest divisor of ff that is <= _BF_TARGET and lane-aligned."""
    for bf in range(min(_BF_TARGET, ff), 127, -128):
        if ff % bf == 0:
            return bf
    return ff


def ff_supported(x: Array, w1, w2) -> bool:
    """Shapes/dtypes the kernel handles profitably: large bf16 blocks
    with lane-aligned dims (small/test shapes stay on the XLA path)."""
    if x.dtype != jnp.bfloat16:
        return False
    if w1.dtype != jnp.bfloat16 or w2.dtype != jnp.bfloat16:
        return False
    d, ff = w1.shape
    if w2.shape != (ff, d):
        return False
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return (x.shape[-1] == d and d % 256 == 0 and ff % 256 == 0
            and rows >= _BS and _pick_bf(ff) >= 256)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ff(x: Array, w1: Array, w2: Array, *,
             interpret: bool = False) -> Array:
    """gelu(x @ w1) @ w2 with the hidden kept on-chip.

    x: (..., D); w1: (D, FF); w2: (FF, D). Rows are flattened and
    padded up to the row-tile size (pad rows compute garbage that is
    sliced away — they cannot NaN the accumulator because gelu and the
    GEMMs are row-local).
    """
    d, ff = w1.shape
    bf = _pick_bf(ff)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    rows = x2.shape[0]
    pad = (-rows) % _BS
    if pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((pad, d), x2.dtype)], axis=0)
    grid = (x2.shape[0] // _BS, ff // bf)
    out = pl.pallas_call(
        _ff_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((_BS, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, bf), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bf, d), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BS, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], d), x.dtype),
        scratch_shapes=[pltpu.VMEM((_BS, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, w1, w2)
    if pad:
        out = out[:rows]
    return out.reshape(*lead, d)


# torch.nn.LayerNorm default eps — must match models/nn.py LAYERNORM_EPS.
_LN_EPS = 1e-5


@functools.partial(jax.jit, static_argnames=("use_gate", "interpret"))
def fused_ff_modulated(x: Array, scale: Array, shift: Array,
                       w1: Array, w2: Array, gate: Array = None, *,
                       use_gate: bool = True,
                       interpret: bool = False) -> Array:
    """AdaLN-modulated FF in one kernel:

        y = x + gate * [ gelu(ssn(x, scale, shift) @ w1) @ w2 ]

    (or just the bracketed FF of the normed input when use_gate=False —
    the tp-mesh path psums partials before applying the gate outside).
    x: (B, L, D); scale/shift/gate: (B, D) broadcast over L.
    """
    b, l, d = x.shape
    ff = w1.shape[1]
    bf = _pick_bf(ff)
    pad = (-l) % _BS
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((b, pad, d), x.dtype)], axis=1)
    if gate is None:
        gate = jnp.zeros((b, d), jnp.float32)
    grid = (b, x.shape[1] // _BS, ff // bf)
    out = pl.pallas_call(
        functools.partial(_ff_mod_kernel, ln_eps=_LN_EPS, gate=use_gate),
        grid=grid,
        in_specs=[pl.BlockSpec((1, _BS, d), lambda b_, i, j: (b_, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda b_, i, j: (b_, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda b_, i, j: (b_, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda b_, i, j: (b_, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, bf), lambda b_, i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bf, d), lambda b_, i, j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _BS, d), lambda b_, i, j: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, x.shape[1], d), x.dtype),
        scratch_shapes=[pltpu.VMEM((_BS, d), jnp.float32),
                        pltpu.VMEM((_BS, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, scale, shift, gate, w1, w2)
    if pad:
        out = out[:, :l]
    return out
