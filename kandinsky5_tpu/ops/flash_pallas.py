"""Pallas TPU flash-attention kernel (non-causal, optional KV mask).

Replaces the reference's FlashAttention-2/3 CUDA dependency
(/root/reference/kandinsky/models/nn.py:9-23,201,254,336). Online-softmax
attention tiled for the MXU with a (batch*heads, q-blocks, kv-blocks)
grid; the kv dimension is innermost so Pallas double-buffers K/V block
DMAs from HBM while the MXU computes — sequence length is bounded by HBM,
not VMEM (the 10s config runs 93,696 visual tokens).
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

BLOCK_Q = 1024
BLOCK_K = 1024
_STAT = 128  # lane-width replication for row statistics kept in VMEM


def flash_supported(q: Array, k: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    lq, lk, d = q.shape[1], k.shape[1], q.shape[-1]
    return (lq % BLOCK_Q == 0 and lk % BLOCK_K == 0 and d in (64, 128, 256)
            and q.dtype in (jnp.bfloat16, jnp.float32))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale: float, num_k: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)  # (BLOCK_Q, D)
    k = k_ref[0]                      # (BLOCK_K, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q * scale, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK_Q, BLOCK_K)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_bhld(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    num_k = lk // BLOCK_K
    grid = (bh, lq // BLOCK_Q, num_k)
    kernel = functools.partial(_flash_kernel, scale=scale, num_k=num_k)
    flops = 4 * lq * lk * d * bh
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, d), jnp.float32),
            pltpu.VMEM((BLOCK_Q, _STAT), jnp.float32),
            pltpu.VMEM((BLOCK_Q, _STAT), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=lq * lk * bh),
        interpret=interpret,
    )(q, k, v)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    interpret: bool = False,
) -> Array:
    """(B, L, H, D) non-causal flash attention.

    kv_mask currently routes to the dense path (only the tiny text/cross
    sequences are masked; the 47k–94k-token visual self-attention hot
    path is unmasked).
    """
    if kv_mask is not None:
        from kandinsky5_tpu.ops.attention import dense_attention

        return dense_attention(q, k, v, kv_mask=kv_mask)
    b, lq, h, d = q.shape
    lk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    out = _flash_bhld(qf, kf, vf, interpret=interpret)
    return out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
