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
  * KV blocks are fetched in groups of GROUP=8 (512 tokens) with
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
GROUP = 8       # kv blocks fetched per DMA group (512 tokens)
_NEG = -1e30


def sparse_supported(q: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    b, s, h, d = q.shape
    s1 = s // BLOCK
    return s % (BLOCK * GROUP) == 0 and s1 % 8 == 0 and d in (64, 128)


def _kernel(nb_ref, inds_ref, shift_ref, q_ref, kv_hbm, o_ref,
            kvbuf, sems, acc_ref, l_ref, *, s1: int, d: int,
            scale: float, bank_rows: int):
    """One (batch*head, q-bank) program.

    kv_hbm: (bh, s1, BLOCK, 2d) lane-packed K||V blocks; each DMA copies
    one full (BLOCK, 2d) sub-array (128-lane aligned for d=64).
    nb_ref: (1, 1, n_banks) SMEM counts; inds_ref: (1, bank_rows, s1)
    SMEM block packing ``bank_rows`` banks' index lists (revisited by the
    index map to satisfy SMEM tile-shape rules); ``row`` selects this
    program's list.
    """
    bh_idx = pl.program_id(0)
    i = pl.program_id(1)
    row = jax.lax.rem(i, bank_rows)
    nb = nb_ref[0, 0, i]
    shift = shift_ref[0]
    nsteps = (nb + GROUP - 1) // GROUP

    def group_dma(g, slot, p):
        idx = inds_ref[0, row, jnp.minimum(g * GROUP + p, s1 - 1)]
        return pltpu.make_async_copy(
            kv_hbm.at[bh_idx, idx], kvbuf.at[slot, p], sems.at[slot, p])

    def start_group(g, slot):
        for p in range(GROUP):
            group_dma(g, slot, p).start()

    def wait_group(g, slot):
        for p in range(GROUP):
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

        kv = kvbuf[slot].reshape(GROUP * BLOCK, 2 * d)
        kblk = kv[:, :d]
        vblk = kv[:, d:]
        s = jax.lax.dot_general(
            q, kblk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (q_block, GROUP*BLOCK)
        # mask garbage columns of the ragged last group
        col_block = g * GROUP + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1) // BLOCK
        s = jnp.where(col_block < nb, s, _NEG)
        p = jnp.exp(s - shift)
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
    s1 = kv.shape[1]              # kv is (bh, s1, BLOCK, 2d)
    n_banks = (sq // BLOCK) // q_rows
    q_block = q_rows * BLOCK
    # SMEM tile-shape rules: the second-to-last block dim must divide by
    # 8 or equal the array dim — pack 8 banks per block, or all of them
    bank_rows = 8 if n_banks % 8 == 0 else n_banks
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_kernel, s1=s1, d=d, scale=scale,
                               bank_rows=bank_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(bh, n_banks),
        in_specs=[
            pl.BlockSpec((1, 1, n_banks), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),            # kv_nb row
            pl.BlockSpec((1, bank_rows, s1),
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
            pltpu.VMEM((2, GROUP, BLOCK, 2 * d), q.dtype),    # kv buffer
            pltpu.SemaphoreType.DMA((2, GROUP)),
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
                     interpret: bool = False) -> Array:
    """(B, S, H, D) block-sparse attention.

    kv_inds: (B, H, n_banks, s1) int32 active-first column lists;
    kv_nb: (B, H, n_banks) int32 active counts, where
    n_banks = s1 // q_rows (ops/nabla.block_mask_to_kv_lists on the
    (optionally union-grouped) mask).
    """
    b, s, h, d = q.shape
    s1 = s // BLOCK
    n_banks = s1 // q_rows
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    inds = kv_inds.reshape(b * h, n_banks, s1)
    nb = kv_nb.reshape(b * h, 1, n_banks)
    shift = score_bound(qf, kf)
    # pad the bank dim to a multiple of 8 so each SMEM index block holds
    # 8 banks (a full-list block would blow the ~1MB SMEM budget at the
    # 10s shape); padded banks have zero counts and their q rows are
    # sliced off below
    bank_pad = (-n_banks) % 8
    if bank_pad:
        inds = jnp.pad(inds, ((0, 0), (0, bank_pad), (0, 0)))
        nb = jnp.pad(nb, ((0, 0), (0, 0), (0, bank_pad)))
        qf = jnp.pad(qf, ((0, 0), (0, bank_pad * q_rows * BLOCK), (0, 0)))
    # lane-packed block-major K||V: one 128-lane-aligned DMA per block
    kv = jnp.concatenate([kf, vf], axis=-1).reshape(b * h, s1, BLOCK, 2 * d)
    out = _sparse_bhld(qf, kv, inds, nb, shift, q_rows=q_rows,
                       interpret=interpret)
    out = out[:, :s]
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
