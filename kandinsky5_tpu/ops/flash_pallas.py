"""Pallas TPU flash-attention kernel (non-causal, optional KV mask).

Replaces the reference's FlashAttention-2/3 CUDA dependency
(/root/reference/kandinsky/models/nn.py:9-23,201,254,336). Online-softmax
attention tiled for the MXU with a (batch*heads, q-blocks, kv-blocks)
grid; the kv dimension is innermost so Pallas double-buffers K/V block
DMAs from HBM while the MXU computes — sequence length is bounded by HBM,
not VMEM (the 10s config runs 93,696 visual tokens).

Performance notes (measured on v5e, head_dim 64, 47,616 tokens):

  * The classic running-max online softmax costs ~27% wall clock: the
    max/alpha-rescale VPU passes serialize against the MXU.
  * This model QK-RMSNorms every attention input (nn.py:193-197), so
    scores are tightly bounded. We exploit that with a *fixed-shift*
    softmax: a global bound b >= max score is computed outside the kernel
    (one cheap row-norm reduction over Q and K) and exp(s - b) is
    accumulated without tracking a running max — the VPU work then fully
    overlaps the MXU (measured: identical wall clock to matmuls alone).
    exp(s - b) cannot overflow since s <= b, and cannot meaningfully
    underflow since |s| <= b stays O(10) for normed inputs (fp32 exp is
    exact to ~1e-38). A safety clamp on the normalizer guards the
    impossible all-underflow row.
  * Default blocks (512, 1024): 512 divides both production sequence
    lengths; larger q blocks measured slower.

Other lengths are handled by padding K/V to a block multiple and masking
the tail; padded Q rows compute garbage that is sliced off.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_Q = 512
BLOCK_K = 1024
_STAT = 128   # lane-width replication for row statistics kept in VMEM
_NEG = -1e30  # effective -inf that keeps exp() NaN-free on masked rows


def flash_supported(q: Array, k: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return q.shape[-1] in (64, 128, 256) and q.dtype in (jnp.bfloat16, jnp.float32)


def _kernel_fixed(q_ref, k_ref, v_ref, mask_ref, shift_ref, o_ref,
                  acc_ref, l_ref, *, scale: float, num_k: int, masked: bool):
    """Fixed-shift softmax: no running max, exp/sum hide under the MXU."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if masked:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, _NEG)
    p = jnp.exp(s - shift_ref[0])
    l_ref[...] += jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
    acc_ref[...] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _kernel_online(q_ref, k_ref, v_ref, mask_ref, shift_ref, o_ref,
                   acc_ref, l_ref, m_ref, *, scale: float, num_k: int,
                   masked: bool):
    """Classic running-max online softmax (fallback for un-normed QK)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if masked:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, _NEG)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("masked", "block_q", "block_k",
                                             "fixed_shift", "interpret"))
def _flash_bhld(q: Array, k: Array, v: Array, mask: Array, shift: Array,
                masked: bool, block_q: int, block_k: int,
                fixed_shift: bool, interpret: bool = False) -> Array:
    """(BH, L, D) flash attention; mask (BH, 1, Lk) int8 used iff ``masked``;
    shift: (1,) fp32 score bound used iff ``fixed_shift``."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    num_k = lk // block_k
    grid = (bh, lq // block_q, num_k)
    scratch = [
        pltpu.VMEM((block_q, d), jnp.float32),
        pltpu.VMEM((block_q, _STAT), jnp.float32),
    ]
    if fixed_shift:
        kernel = functools.partial(_kernel_fixed, scale=scale, num_k=num_k,
                                   masked=masked)
    else:
        kernel = functools.partial(_kernel_online, scale=scale, num_k=num_k,
                                   masked=masked)
        scratch.append(pltpu.VMEM((block_q, _STAT), jnp.float32))
    flops = 4 * lq * lk * d * bh
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # bh/q-block dims are independent; kv is the softmax reduction
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=lq * lk * bh),
        interpret=interpret,
    )(q, k, v, mask, shift)


def _pad_to(x: Array, axis: int, mult: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


def score_bound(q: Array, k: Array) -> Array:
    """Upper bound on softmax scores: max_i ||q_i|| * max_j ||k_j|| / sqrt(D).
    One cheap fused reduction over Q and K (O(S·D) vs the O(S²·D) kernel)."""
    d = q.shape[-1]
    qn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)))
    kn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)))
    return (qn * kn / math.sqrt(d)).reshape(1)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    block_q: int = BLOCK_Q,
    block_k: int = BLOCK_K,
    fixed_shift: bool = True,
    interpret: bool = False,
) -> Array:
    """(B, L, H, D) non-causal flash attention with optional (B, Lk) bool
    KV mask (masks padded text keys — the TPU replacement for the
    reference's varlen cu_seqlens packing).

    ``fixed_shift=True`` uses the bounded-score softmax (see module
    docstring) — correct whenever scores are bounded, which QK-RMSNorm
    guarantees here; pass False for generic inputs.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)

    qf, lq_orig = _pad_to(qf, 1, block_q)
    kf, _ = _pad_to(kf, 1, block_k)
    vf, _ = _pad_to(vf, 1, block_k)
    lk_pad = kf.shape[1]

    masked = kv_mask is not None or lk_pad != lk
    if kv_mask is None:
        mask_b = jnp.ones((b, lk), jnp.int8)
    else:
        mask_b = kv_mask.astype(jnp.int8)
    mask_b, _ = _pad_to(mask_b, 1, block_k)
    # (B*H, 1, Lk_pad); repeat along heads matches the (b, h) flattening
    mask = jnp.repeat(mask_b, h, axis=0)[:, None, :]

    shift = score_bound(qf, kf) if fixed_shift else jnp.zeros((1,), jnp.float32)

    out = _flash_bhld(qf, kf, vf, mask, shift, masked, block_q, block_k,
                      fixed_shift, interpret=interpret)
    out = out[:, :lq_orig]
    return out.reshape(b, h, lq_orig, d).transpose(0, 2, 1, 3)
