"""Attention ops for TPU: XLA reference paths + Pallas kernel dispatch.

The reference delegates to FlashAttention-2/3 CUDA kernels
(/root/reference/kandinsky/models/nn.py:9-23,201,254,336). Here the
same contract — non-causal multi-head attention, fp32 softmax, bf16
matmuls — is provided by:

  * :func:`dense_attention` — pure-XLA fallback (small shapes, CPU tests)
  * :func:`flash_attention` — Pallas TPU kernel (ops/flash_pallas.py)

Layout is (B, L, H, D) ("BLHD") everywhere, matching the natural output
of the QKV projections and avoiding extra transposes outside kernels.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def dense_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    scale: Optional[float] = None,
) -> Array:
    """Non-causal softmax attention via plain XLA einsums.

    q: (B, Lq, H, D); k, v: (B, Lk, H, D)
    kv_mask: optional (B, Lk) bool — True where the key is valid (used to
    mask padded text tokens; replaces the reference's varlen cu_seqlens).
    Returns (B, Lq, H, D) in q.dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if kv_mask is not None:
        neg = jnp.asarray(-1e30, dtype=s.dtype)
        s = jnp.where(kv_mask[:, None, None, :], s, neg)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhlm,bmhd->blhd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    impl: str = "auto",
) -> Array:
    """Dispatch between the Pallas flash kernel and the XLA fallback.

    ``impl``: "auto" (flash on TPU when shapes allow, else dense),
    "flash", or "dense".
    """
    if impl == "dense":
        return dense_attention(q, k, v, kv_mask=kv_mask)
    from kandinsky5_tpu.ops.flash_pallas import flash_attention, flash_supported

    if impl == "flash" or (impl == "auto" and flash_supported(q, k)):
        return flash_attention(q, k, v, kv_mask=kv_mask)
    return dense_attention(q, k, v, kv_mask=kv_mask)


def flash_vs_dense_max_err(q, k, v, kv_mask=None) -> float:
    """Debug helper: numeric gap between the two implementations."""
    import numpy as np

    from kandinsky5_tpu.ops.flash_pallas import flash_attention

    f = flash_attention(q, k, v, kv_mask=kv_mask)
    d = dense_attention(q, k, v, kv_mask=kv_mask)
    return float(np.max(np.abs(np.asarray(f, np.float32) - np.asarray(d, np.float32))))
