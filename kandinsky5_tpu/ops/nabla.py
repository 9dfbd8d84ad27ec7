"""NABLA block-sparse attention: mask construction + execution paths.

Re-derivation of the reference NABLA machinery
(/root/reference/kandinsky/models/utils.py:108-163, nn.py:257-280) for
TPU:

  * :func:`sta_mask` — the sliding-tile (STA) block mask over the
    (T, H/8, W/8) tile grid. Static per generation; computed on host.
  * :func:`nabla_block_mask` — per-call adaptive mask: mean-pool Q/K over
    64-token blocks, softmax(QK^T/sqrt(D)), keep blocks covering top-CDF
    mass >= P, OR with STA. Dense-small XLA compute ((s1, s1) is at most
    1464^2 for 10s) — stays out of Pallas on purpose.
  * :func:`nabla_attention` — executes attention under the block mask:
    Pallas block-sparse kernel on TPU, or an XLA masked fallback.

The reference materializes a flex-attention BlockMask; we keep the bool
block mask (B, H, s1, s1) and derive compact kv index lists for the
kernel. BLOCK = 64 tokens matches flex BLOCK_SIZE=64
(models/utils.py:162).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 64

Array = jax.Array


@functools.lru_cache(maxsize=16)
def sta_mask(T: int, H: int, W: int, wT: int = 11, wH: int = 3,
             wW: int = 3) -> np.ndarray:
    """(T*H*W, T*H*W) bool sliding-tile mask: block (t,h,w) attends block
    (t',h',w') iff |t-t'| <= wT//2, |h-h'| <= wH//2, |w-w'| <= wW//2.

    Equivalent to reference fast_sta_nabla (models/utils.py:108-133),
    verified in tests; block order is row-major over (T, H, W) which is
    exactly the fractal tile order from ops/fractal.py.
    """
    t = np.arange(T)
    h = np.arange(H)
    w = np.arange(W)
    mt = np.abs(t[:, None] - t[None, :]) <= wT // 2
    mh = np.abs(h[:, None] - h[None, :]) <= wH // 2
    mw = np.abs(w[:, None] - w[None, :]) <= wW // 2
    m = (
        mt[:, None, None, :, None, None]
        & mh[None, :, None, None, :, None]
        & mw[None, None, :, None, None, :]
    )
    return m.reshape(T * H * W, T * H * W)


def nabla_block_mask(q: Array, k: Array, sta: Array, thr: float = 0.9) -> Array:
    """Adaptive block mask (reference nablaT_v2, models/utils.py:136-163).

    q, k: (B, S, H, D) in fractal order, S divisible by BLOCK.
    sta: (s1, s1) bool.
    Returns (B, H, s1, s1) bool.
    """
    b, s, h, d = q.shape
    s1 = s // BLOCK
    qa = q.reshape(b, s1, BLOCK, h, d).mean(axis=2).astype(jnp.float32)
    ka = k.reshape(b, s1, BLOCK, h, d).mean(axis=2).astype(jnp.float32)
    amap = jnp.einsum("bihd,bjhd->bhij", qa, ka, preferred_element_type=jnp.float32)
    amap = jax.nn.softmax(amap / math.sqrt(d), axis=-1)
    # Keep the smallest set of blocks whose probability mass >= thr:
    # sort ascending, drop the prefix with cumulative mass < 1 - thr.
    inds = jnp.argsort(amap, axis=-1)
    vals = jnp.take_along_axis(amap, inds, axis=-1)
    cvals = jnp.cumsum(vals, axis=-1)
    keep_sorted = cvals >= (1.0 - thr)
    # scatter back to original column order (reference gather of argsort)
    mask = jnp.take_along_axis(keep_sorted, jnp.argsort(inds, axis=-1), axis=-1)
    return jnp.logical_or(mask, sta[None, None])


def block_mask_to_kv_lists(mask: Array) -> Tuple[Array, Array]:
    """Compact (B, H, s1, s1) bool mask into per-row kv block lists.

    Returns (kv_inds, kv_nb): kv_inds (B, H, s1, s1) int32 with the
    active block columns first (ascending within the active set), and
    kv_nb (B, H, s1) int32 counts — the same representation flex's
    BlockMask.from_kv_blocks consumes (reference models/utils.py:159-163).
    """
    kv_nb = mask.sum(axis=-1).astype(jnp.int32)
    # stable argsort of ~mask puts active columns first, preserving order
    kv_inds = jnp.argsort(~mask, axis=-1, stable=True).astype(jnp.int32)
    return kv_inds, kv_nb


def masked_block_attention_xla(
    q: Array, k: Array, v: Array, mask: Array, scale: Optional[float] = None
) -> Array:
    """XLA fallback: dense attention with the block mask expanded to a
    token-level additive bias. O(S^2) — for tests and small shapes only.

    q, k, v: (B, S, H, D); mask: (B, H, s1, s1) bool. Returns (B, S, H, D).
    """
    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    sbias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    s1 = s // BLOCK
    scores = scores.reshape(b, h, s1, BLOCK, s1, BLOCK)
    scores = scores + sbias[:, :, :, None, :, None]
    scores = scores.reshape(b, h, s, s)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhij,bjhd->bihd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def nabla_attention(
    q: Array,
    k: Array,
    v: Array,
    sta: Array,
    thr: float = 0.9,
    impl: str = "auto",
) -> Array:
    """Full NABLA path: adaptive mask + block-sparse attention.

    q, k, v: (B, S, H, D) in fractal token order.
    """
    mask = nabla_block_mask(q, k, sta, thr=thr)
    if impl == "xla":
        return masked_block_attention_xla(q, k, v, mask)
    from kandinsky5_tpu.ops.sparse_pallas import (
        sparse_attention,
        sparse_supported,
    )

    if impl == "sparse" or (impl == "auto" and sparse_supported(q)):
        kv_inds, kv_nb = block_mask_to_kv_lists(mask)
        return sparse_attention(q, k, v, kv_inds, kv_nb)
    return masked_block_attention_xla(q, k, v, mask)
