"""NABLA block-sparse attention: mask construction + execution paths.

Re-derivation of the reference NABLA machinery
(/root/reference/kandinsky/models/utils.py:108-163, nn.py:257-280) for
TPU:

  * :func:`sta_mask` — the sliding-tile (STA) block mask over the
    (T, H/8, W/8) tile grid. Static per generation; computed on host.
  * :func:`nabla_block_mask` — per-call adaptive mask: mean-pool Q/K over
    64-token blocks, softmax(QK^T/sqrt(D)), keep blocks covering top-CDF
    mass >= P, OR with STA.

    The reference finds the top-CDF set by sorting each row
    (models/utils.py:152-155). XLA sort on TPU measured 200+ s at the
    10s shape, so the default here finds the same set by *bisecting a
    probability threshold* t: keep {p >= t} with the largest t whose
    kept mass >= P — identical semantics up to fp ties, ~25 masked
    reductions instead of a sort. ``method="sort"`` keeps the exact
    reference algorithm for parity tests.
  * :func:`block_mask_to_kv_lists` — compact active-first index lists
    (the flex BlockMask.from_kv_blocks layout, models/utils.py:159-163)
    built with cumsum + one scatter instead of argsort.
  * :func:`nabla_attention` — executes attention under the block mask:
    the Pallas kernel (ops/sparse_pallas.py) on TPU, or an XLA masked
    fallback.

TPU-specific approximation (``q_rows``): the Pallas kernel processes
banks of 8 consecutive 64-token query blocks (one 512-row MXU-shaped
tile) sharing one KV list. The bank's mask is built at bank granularity:
the STA part is the exact union of its rows' STA windows (a strict
superset of reference attention), and the adaptive part thresholds the
bank-pooled attention map (8x cheaper than the reference's per-64-row
map; rows of one bank are spatially adjacent fractal tiles, so their
pooled statistics track the per-row ones closely). ``q_rows=1``
reproduces the reference mask exactly; ``group_union_mask`` offers the
strict-superset variant of the banked mode.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

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


def _attention_map(q: Array, k: Array, q_pool: int = BLOCK) -> Array:
    """Block-pooled softmax map (B, H, s/q_pool, s1) fp32 (reference
    models/utils.py:143-149 pools both sides over 64; ``q_pool`` > 64
    pools queries at bank granularity for the banked kernel — 8x less
    mask work)."""
    b, s, h, d = q.shape
    s1 = s // BLOCK
    qa = q.reshape(b, s // q_pool, q_pool, h, d).mean(axis=2).astype(jnp.float32)
    ka = k.reshape(b, s1, BLOCK, h, d).mean(axis=2).astype(jnp.float32)
    amap = jnp.einsum("bihd,bjhd->bhij", qa, ka, preferred_element_type=jnp.float32)
    return jax.nn.softmax(amap / math.sqrt(d), axis=-1)


def _topcdf_sort(amap: Array, thr: float) -> Array:
    """Exact reference algorithm: sort ascending, drop the prefix with
    cumulative mass < 1 - thr (models/utils.py:152-155)."""
    inds = jnp.argsort(amap, axis=-1)
    vals = jnp.take_along_axis(amap, inds, axis=-1)
    cvals = jnp.cumsum(vals, axis=-1)
    keep_sorted = cvals >= (1.0 - thr)
    return jnp.take_along_axis(keep_sorted, jnp.argsort(inds, axis=-1), axis=-1)


def _topcdf_bisect(amap: Array, thr: float, iters: int = 25) -> Array:
    """Same kept set via threshold bisection: largest t with
    mass({p >= t}) >= thr. Monotone in t, so ~25 halvings converge to fp
    precision; ties at the final threshold may differ from the sort by
    one block (measure-zero for continuous scores)."""
    lo = jnp.zeros(amap.shape[:-1] + (1,), jnp.float32)
    hi = jnp.max(amap, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(amap >= mid, amap, 0.0), axis=-1,
                       keepdims=True)
        ok = mass >= thr
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return amap >= lo


def _count_cap_threshold(amap: Array, cap_count: int,
                         iters: int = 25) -> Array:
    """Per-row threshold t (broadcastable) such that
    |{p >= t}| <= cap_count — a top-K ceiling found by bisection
    (count is monotone decreasing in t)."""
    lo = jnp.zeros(amap.shape[:-1] + (1,), jnp.float32)
    hi = jnp.max(amap, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        count = jnp.sum(amap >= mid, axis=-1, keepdims=True)
        over = count > cap_count
        return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def nabla_block_mask(q: Array, k: Array, sta: Array, thr: float = 0.9,
                     method: str = "bisect", q_rows: int = 1,
                     max_density: Optional[float] = None) -> Array:
    """Adaptive block mask (reference nablaT_v2, models/utils.py:136-163).

    q, k: (B, S, H, D) in fractal order, S divisible by BLOCK.
    sta: (s1, s1) bool. Returns (B, H, s1//q_rows, s1) bool; q_rows > 1
    pools queries at bank granularity (the STA part becomes the exact
    union of its rows; the adaptive part thresholds the pooled map).

    ``max_density`` adds a per-row top-K ceiling (kept fraction of s1)
    so the sparse path's worst case — near-uniform attention keeping
    ~all blocks — never costs more than dense flash. With the released
    checkpoints attention is peaked (~5-15% kept) and the cap is inert;
    it only truncates the pathological near-uniform rows where the
    top-CDF criterion barely discriminates anyway.
    """
    amap = _attention_map(q, k, q_pool=q_rows * BLOCK)
    if method == "sort":
        mask = _topcdf_sort(amap, thr)
    else:
        mask = _topcdf_bisect(amap, thr)
    if max_density is not None and max_density < 1.0:
        cap = max(1, int(amap.shape[-1] * max_density))
        t_cap = _count_cap_threshold(amap, cap)
        mask = mask & (amap >= t_cap)
    sta_g = sta
    if q_rows > 1:
        s1 = sta.shape[0]
        sta_g = sta.reshape(s1 // q_rows, q_rows, s1).any(axis=1)
    return jnp.logical_or(mask, sta_g[None, None])


def group_union_mask(mask: Array, q_rows: int) -> Array:
    """Union the mask over groups of ``q_rows`` consecutive query blocks:
    (B, H, s1, s1) -> (B, H, s1//q_rows, s1)."""
    b, h, s1, _ = mask.shape
    return mask.reshape(b, h, s1 // q_rows, q_rows, s1).any(axis=3)


def block_mask_to_kv_lists(mask: Array) -> Tuple[Array, Array]:
    """Compact a (..., rows, s1) bool mask into per-row kv block lists.

    Returns (kv_inds, kv_nb): kv_inds (..., rows, s1) int32 with the
    active block columns first (ascending within each partition) and
    kv_nb (..., rows) int32 counts — the flex BlockMask.from_kv_blocks
    layout (reference models/utils.py:159-163). Built with one top_k
    over composite keys — 3x faster on TPU than the cumsum+scatter
    construction it replaces (XLA scatter serializes; 88 -> 29 ms at
    the 10s shape) and bit-identical to it.
    """
    s1 = mask.shape[-1]
    nb = mask.sum(axis=-1).astype(jnp.int32)
    col = jnp.arange(s1, dtype=jnp.int32)
    # active rows get keys 2*s1-col (largest, ascending col first under
    # top_k's descending order), inactive rows s1-col (after them, also
    # ascending col)
    key = jnp.where(mask, (2 * s1) - col, s1 - col)
    _, inds = jax.lax.top_k(key, s1)
    return inds.astype(jnp.int32), nb


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


class NablaMask(NamedTuple):
    """A built adaptive mask, reusable across attention calls (the
    shared-mask extension: compute once per step, apply in every
    layer — the reference rebuilds per layer per branch)."""

    gmask: Array     # (B, H, s1//q_rows, s1) bool banked block mask
    kv_inds: Array   # flex kv-list layout (sparse kernel input)
    kv_nb: Array
    q_rows: int


def nabla_build_mask(q: Array, k: Array, sta: Array, thr: float = 0.9,
                     q_rows: int = 8,
                     max_density: Optional[float] = 0.75,
                     method: str = "bisect") -> NablaMask:
    """Build the banked adaptive mask + kv lists from q, k.

    ``q_rows=1, max_density=None, method="sort"`` is the exact-reference
    parity mode (models/utils.py:136-163 semantics) running through the
    same sparse kernel as production; the defaults are the measured-fast
    TPU configuration whose deviations tests/test_nabla_semantics.py
    quantifies (mask IoU + output delta).
    """
    s1 = q.shape[1] // BLOCK
    if s1 % max(q_rows, 1) != 0:
        q_rows = 1
    # bank-granular mask: 8x cheaper build, feeds the banked kernel.
    # (128-token kv pages — adjacent-block union halving the DMA issue
    # count — measured a WASH at realistic clustered densities: the
    # pair-union's +8% density cancels the saved issues, 166 vs 169
    # ms/layer at 12% STA density; the kernel keeps the exact 64-token
    # flex granularity, with the paged path available via
    # sparse_attention(kv_page_blocks=2) for coarser masks.)
    gmask = nabla_block_mask(q, k, sta, thr=thr, method=method,
                             q_rows=q_rows, max_density=max_density)
    kv_inds, kv_nb = block_mask_to_kv_lists(gmask)
    return NablaMask(gmask, kv_inds, kv_nb, q_rows)


def _sparse_attention_sharded(q: Array, k: Array, v: Array, m: NablaMask,
                              mesh, interpret: bool = False) -> Array:
    """shard_map'd block-sparse attention over ("dp", "sp", "tp"):
    heads over tp (whole heads with their kv lists), query BANKS over sp
    (q tokens + list rows sliced together; K/V all-gathered inside so
    every bank's list can address the full sequence), batch over dp —
    the same decomposition as ops/attention._sharded_attention, for the
    10s NABLA path on device counts that don't divide 28 heads.

    Banks are padded to sp-divisibility with zero-count rows (the kernel
    already treats nb=0 banks as no-ops); the padded q rows are sliced
    off after.
    """
    from jax.experimental.shard_map import shard_map

    from kandinsky5_tpu.ops.sparse_pallas import sparse_attention

    b, s, h, d = q.shape
    rows = m.kv_nb.shape[-1]
    q_rows = m.q_rows
    shape = dict(mesh.shape)
    dp = "dp" if shape.get("dp", 1) > 1 and b % shape["dp"] == 0 else None
    tp = "tp" if shape.get("tp", 1) > 1 and h % shape["tp"] == 0 else None
    sp_n = shape.get("sp", 1)
    sp = "sp" if sp_n > 1 else None
    kv_inds, kv_nb = m.kv_inds, m.kv_nb
    pad_rows = 0
    if sp is not None:
        pad_rows = (-rows) % sp_n
        if pad_rows:
            q = jnp.pad(q, ((0, 0), (0, pad_rows * q_rows * BLOCK),
                            (0, 0), (0, 0)))
            kv_inds = jnp.pad(kv_inds, ((0, 0), (0, 0), (0, pad_rows),
                                        (0, 0)))
            kv_nb = jnp.pad(kv_nb, ((0, 0), (0, 0), (0, pad_rows)))
    if dp is None and tp is None and sp is None:
        return sparse_attention(q, k, v, kv_inds, kv_nb, q_rows=q_rows,
                                interpret=interpret)
    # K/V shard over sp only when the sequence splits into whole
    # 64-token KV blocks per device (all_gather must reconstitute page
    # boundaries); otherwise they stay replicated along sp and only the
    # query banks split.
    kv_seq = (sp if sp is not None and s % sp_n == 0
              and (s // sp_n) % BLOCK == 0 else None)

    def body(q_l, k_l, v_l, inds_l, nb_l):
        if kv_seq is not None:
            k_l = jax.lax.all_gather(k_l, kv_seq, axis=1, tiled=True)
            v_l = jax.lax.all_gather(v_l, kv_seq, axis=1, tiled=True)
        return sparse_attention(q_l, k_l, v_l, inds_l, nb_l,
                                q_rows=q_rows, interpret=interpret)

    from jax.sharding import PartitionSpec as P

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(dp, sp, tp, None), P(dp, kv_seq, tp, None),
                  P(dp, kv_seq, tp, None), P(dp, tp, sp, None),
                  P(dp, tp, sp)),
        out_specs=P(dp, sp, tp, None), check_rep=False,
    )(q, k, v, kv_inds, kv_nb)
    return out[:, :s] if pad_rows else out


def nabla_attention(
    q: Array,
    k: Array,
    v: Array,
    sta: Array,
    thr: float = 0.9,
    impl: str = "auto",
    q_rows: int = 8,
    max_density: Optional[float] = 0.75,
    method: str = "bisect",
    shared: Optional[NablaMask] = None,
) -> Array:
    """Full NABLA path: adaptive mask + block-sparse attention.

    q, k, v: (B, S, H, D) in fractal token order. ``q_rows`` > 1 enables
    the banked union kernel (see module docstring). ``max_density`` caps
    the kept fraction per row (see nabla_block_mask) — bounds worst-case
    sparse cost below dense flash; None disables. ``shared`` supplies a
    precomputed NablaMask (shared-mask mode) instead of building one
    from this call's q, k.
    """
    from kandinsky5_tpu.ops.sparse_pallas import (
        sparse_attention,
        sparse_supported,
    )

    use_sparse = impl == "sparse" or (impl == "auto" and sparse_supported(q))
    if not use_sparse:
        if shared is not None:
            mask = jnp.repeat(shared.gmask, shared.q_rows, axis=2)
        else:
            mask = nabla_block_mask(q, k, sta, thr=thr, method="sort")
        return masked_block_attention_xla(q, k, v, mask)
    m = shared if shared is not None else nabla_build_mask(
        q, k, sta, thr=thr, q_rows=q_rows, max_density=max_density,
        method=method)
    from kandinsky5_tpu.parallel.sharding import active_mesh

    mesh = active_mesh()
    if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
        return _sparse_attention_sharded(q, k, v, m, mesh)
    return sparse_attention(q, k, v, m.kv_inds, m.kv_nb, q_rows=m.q_rows)
