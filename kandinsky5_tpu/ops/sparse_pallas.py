"""Pallas TPU block-sparse attention consuming NABLA kv-block lists.

TPU-native replacement for torch flex_attention + BlockMask
(/root/reference/kandinsky/models/nn.py:257-280): for each query bank
(``q_rows`` consecutive 64-token NABLA blocks — one fractal (1,8,8)
tile each), attend only the KV blocks listed active (ops/nabla.py emits
the flex BlockMask.from_kv_blocks layout, models/utils.py:159-163).

Kernel structure (paged-attention style):
  * grid (batch*heads, q_banks); K/V stay in HBM;
  * the bank's active block list sits in SMEM (scalar reads drive DMA
    addressing);
  * KV pages are fetched in groups of STEP=512 tokens with
    double-buffered async DMA overlapping the MXU;
  * k and v are packed lane-wise into one (bh, s1, 64, 2d) HBM array:
    manual DMAs need 128-aligned lane extents (d=64 alone is rejected),
    and the packing halves the DMA count — one copy fetches both;
  * fixed-shift softmax — NABLA runs only inside the DiT's QK-RMSNorm'd
    self-attention, so scores are bounded (see flash_pallas.py).

``q_rows=8`` (default via ops/nabla.py) gives MXU-shaped (512, 512)
score tiles and ~8x fewer DMA programs at the cost of attending the
union of the bank's lists; ``q_rows=1`` reproduces flex semantics
exactly.

Measured cost model (v5e, 10s shape: 28 heads x 183 banks):
  * per-program fixed cost 9.8 us (empty-mask run) — launch + SMEM
    list fetch + accumulator init/finalize; ~30% of a layer call at
    the ~12% clustered density of real checkpoints;
  * per 8-block group step, the 16 scalar-core DMA issues/waits
    (~0.7-1 us) exceed the 0.35 us of MXU work — the kernel is
    DMA-issue-rate-bound. 128-token pages (kv_page_blocks=2) halve the
    issues but the pair-union densifies the mask by ~8%: a measured
    wash. Running 2 banks (own lists, no union) per program was also
    measured NEUTRAL (165 vs 166 ms at 12% density; the fixed cost
    scales per bank — accumulator init + q/out block traffic — not per
    program launch), so the one-bank structure stays.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kandinsky5_tpu.ops.flash_pallas import score_bound

Array = jax.Array

BLOCK = 64      # tokens per NABLA block (flex BLOCK_SIZE=64)
STEP = 512      # kv tokens consumed per kernel step (one MXU-shaped tile)
_NEG = -1e30


def sparse_supported(q: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    b, s, h, d = q.shape
    s1 = s // BLOCK
    return s % STEP == 0 and s1 % 8 == 0 and d in (64, 128)


def _kernel(nb_ref, inds_ref, shift_ref, q_ref, kv_hbm, o_ref,
            kvbuf, sems, acc_ref, l_ref, *, n_pages: int, d: int,
            page: int, group: int, bank_rows: int):
    """One (batch*head, q-bank) program.

    kv_hbm: (bh, n_pages, page, 2d) lane-packed K||V pages; each DMA
    copies one full (page, 2d) sub-array (128-lane aligned for d=64).
    ``page`` tokens per DMA (64 = exact flex granularity, 128 = paired
    pages halving the DMA issue rate, which bounds this kernel);
    ``group`` pages per kernel step (group*page == STEP tokens).
    nb_ref: (1, 1, n_banks) SMEM ACTIVE-PAGE counts; inds_ref:
    (1, bank_rows, n_pages) SMEM page-index lists packing ``bank_rows``
    banks (revisited by the index map to satisfy SMEM tile-shape
    rules); ``row`` selects this program's list.
    """
    bh_idx = pl.program_id(0)
    i = pl.program_id(1)
    row = jax.lax.rem(i, bank_rows)
    nb = nb_ref[0, 0, i]
    shift = shift_ref[0]
    nsteps = (nb + group - 1) // group

    def group_dma(g, slot, p):
        idx = inds_ref[0, row, jnp.minimum(g * group + p, n_pages - 1)]
        return pltpu.make_async_copy(
            kv_hbm.at[bh_idx, idx], kvbuf.at[slot, p], sems.at[slot, p])

    def start_group(g, slot):
        for p in range(group):
            group_dma(g, slot, p).start()

    def wait_group(g, slot):
        for p in range(group):
            group_dma(g, slot, p).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    l_ref[...] = jnp.zeros_like(l_ref)
    q = q_ref[0]  # (q_block, d)

    # padded banks have nb == 0: starting a DMA that is never waited on
    # would leak semaphore signals into the next program
    @pl.when(nsteps > 0)
    def _first_prefetch():
        start_group(0, 0)

    def body(g, _):
        slot = jax.lax.rem(g, 2)
        next_slot = jax.lax.rem(g + 1, 2)

        @pl.when(g + 1 < nsteps)
        def _prefetch():
            start_group(g + 1, next_slot)

        wait_group(g, slot)

        kv = kvbuf[slot].reshape(group * page, 2 * d)
        kblk = kv[:, :d]
        vblk = kv[:, d:]
        # q arrives pre-scaled by scale*log2(e) (see _sparse_bhld), so
        # the matmul emits log2-domain scores directly and exp2 — the
        # native VPU transcendental — replaces exp; the explicit
        # *scale VPU pass over the score tile is gone
        s = jax.lax.dot_general(
            q, kblk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q_block, group*page), scaled by log2(e)/sqrt(d)
        # mask garbage columns of the ragged last group
        col_page = g * group + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1) // page
        s = jnp.where(col_page < nb, s, _NEG)
        p = jnp.exp2(s - shift)
        l_ref[...] += jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        acc_ref[...] += jax.lax.dot_general(
            p.astype(vblk.dtype), vblk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nsteps, body, 0)
    l = jnp.maximum(l_ref[:, :1], 1e-30)
    o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_rows", "interpret"))
def _sparse_bhld(q: Array, kv: Array, kv_inds: Array, kv_nb: Array,
                 shift: Array, q_rows: int,
                 interpret: bool = False) -> Array:
    bh, sq, d = q.shape
    n_pages, page = kv.shape[1], kv.shape[2]  # kv: (bh, n_pages, page, 2d)
    group = STEP // page
    n_banks = (sq // BLOCK) // q_rows
    q_block = q_rows * BLOCK
    # SMEM tile-shape rules: the second-to-last block dim must divide by
    # 8 or equal the array dim — pack 8 banks per block, or all of them
    bank_rows = 8 if n_banks % 8 == 0 else n_banks
    kernel = functools.partial(_kernel, n_pages=n_pages, d=d, page=page,
                               group=group, bank_rows=bank_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(bh, n_banks),
        in_specs=[
            pl.BlockSpec((1, 1, n_banks), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # kv_nb row
            pl.BlockSpec((1, bank_rows, n_pages),
                         lambda b, i: (b, i // bank_rows, 0),
                         memory_space=pltpu.SMEM),            # kv_inds bank
            pl.BlockSpec(memory_space=pltpu.SMEM),            # shift
            pl.BlockSpec((1, q_block, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),            # q bank
            pl.BlockSpec(memory_space=pltpu.ANY),             # kv (HBM)
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, group, page, 2 * d), q.dtype),     # kv buffer
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.VMEM((q_block, d), jnp.float32),            # acc
            pltpu.VMEM((q_block, 128), jnp.float32),          # l
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_nb, kv_inds, shift, q, kv)


def sparse_attention(q: Array, k: Array, v: Array, kv_inds: Array,
                     kv_nb: Array, q_rows: int = 1,
                     kv_page_blocks: int = 1,
                     interpret: bool = False) -> Array:
    """(B, S, H, D) block-sparse attention.

    kv_inds: (B, H, n_banks, n_pages) int32 active-first PAGE lists;
    kv_nb: (B, H, n_banks) int32 active-page counts, where
    n_banks = s1 // q_rows and n_pages = s1 // kv_page_blocks
    (ops/nabla.block_mask_to_kv_lists on the grouped/paged mask).
    ``kv_page_blocks=2`` fetches 128-token pages — half the DMA issues,
    which bound this kernel; the caller supplies the page-unioned mask.
    """
    b, s, h, d = q.shape
    sk = k.shape[1]  # may exceed s: sp-sharded queries against full KV
    s1 = sk // BLOCK
    page = kv_page_blocks * BLOCK
    n_pages = s1 // kv_page_blocks
    n_banks = (s // BLOCK) // q_rows
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    inds = kv_inds.reshape(b * h, n_banks, n_pages)
    nb = kv_nb.reshape(b * h, 1, n_banks)
    # fold softmax scale + the exp->exp2 base change into q and the
    # shift (see _kernel): s and shift both live in the log2 domain
    shift = score_bound(qf, kf) * math.log2(math.e)
    qf = (qf.astype(jnp.float32)
          * (math.log2(math.e) / math.sqrt(d))).astype(qf.dtype)
    # pad the bank dim to a multiple of 8 so each SMEM index block holds
    # 8 banks (a full-list block would blow the ~1MB SMEM budget at the
    # 10s shape); padded banks have zero counts and their q rows are
    # sliced off below
    bank_pad = (-n_banks) % 8
    if bank_pad:
        inds = jnp.pad(inds, ((0, 0), (0, bank_pad), (0, 0)))
        nb = jnp.pad(nb, ((0, 0), (0, 0), (0, bank_pad)))
        qf = jnp.pad(qf, ((0, 0), (0, bank_pad * q_rows * BLOCK), (0, 0)))
    # lane-packed page-major K||V: one 128-lane-aligned DMA per page
    kv = jnp.concatenate([kf, vf], axis=-1).reshape(b * h, n_pages, page,
                                                   2 * d)
    out = _sparse_bhld(qf, kv, inds, nb, shift, q_rows=q_rows,
                       interpret=interpret)
    out = out[:, :s]
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
