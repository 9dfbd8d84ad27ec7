"""Pallas TPU flash-attention kernel (non-causal, KV-mask and
monotone-segment masking).

Replaces the reference's FlashAttention-2/3 CUDA dependency
(/root/reference/kandinsky/models/nn.py:9-23,201,254,336). Online-softmax
attention tiled for the MXU with a (batch*heads, q-blocks, kv-blocks)
grid; the kv dimension is innermost so Pallas double-buffers K/V block
DMAs from HBM while the MXU computes — sequence length is bounded by HBM,
not VMEM (the 10s config runs 93,696 visual tokens).

Masking modes, composable:
  * ``kv_mask`` (B, Lk) bool — masks padded text keys (replaces the
    reference's varlen cu_seqlens packing).
  * ``q_ids``/``kv_ids`` (B, L) int32 non-decreasing — position i may
    attend j iff q_id[i] >= kv_id[j]. Covers causal attention
    (ids = arange) and the VAE's frame-causal attention (ids = frame
    index per voxel, vae.py:110-122). Fully-masked kv blocks are
    skipped using the monotonicity (block max/min comparison).

Performance notes (measured on v5e, head_dim 64, 47,616 tokens):

  * The classic running-max online softmax costs ~27% wall clock: the
    max/alpha-rescale VPU passes serialize against the MXU.
  * The DiT QK-RMSNorms every attention input (nn.py:193-197), so
    scores are tightly bounded. We exploit that with a *fixed-shift*
    softmax: a global bound b >= max score is computed outside the kernel
    (one cheap row-norm reduction over Q and K) and exp(s - b) is
    accumulated without tracking a running max — the VPU work then fully
    overlaps the MXU (measured: identical wall clock to matmuls alone).
    exp(s - b) cannot overflow since s <= b, and cannot meaningfully
    underflow since |s| <= b stays O(10) for normed inputs. A safety
    clamp on the normalizer guards the impossible all-underflow row.
    Un-normed callers (e.g. the VAE) pass fixed_shift=False for the
    classic online softmax.
  * The fixed-shift kernel reads K pre-transposed (d, Lk) so the MXU's
    rhs needs no per-program transpose, and runs (1536, 1536) blocks:
    79 TFLOP/s useful at the 5s shape, ~80% of the d=64 ceiling
    (the MXU computes 128-lane contractions regardless, so useful
    throughput is capped at ~98 TFLOP/s for 64-wide heads).
  * ``qk_int8`` (opt-in) breaks that ceiling SageAttention-style: QK^T
    runs s8xs8->s32 at the MXU's 2x int8 rate (measured 292 vs 191 T/s
    raw, tools/bench_int8mm.py), K is mean-centered per head before
    quantization (softmax-invariant — the dropped q.k_mean term is
    constant along each score row), Q gets one scale per (batch, head)
    (rows are QK-RMSNorm'd, so their range is tight), K one scale per
    token; PV stays bf16. 95 TFLOP/s useful at the 5s shape (round-3
    sweeps: (bq, bk) = (1536, 512) best — 95.0 vs 92.6 at the earlier
    768 default; 384/640/256 kv blocks and bq 1024/1152/1920/2048 all
    slower; 1536/1536 and 2048/768 regress — the fp32 score tile
    outgrows VMEM headroom);
    per-call max-abs error 0.0024 vs dense where the bf16 kernel's own
    is 0.0010. s8xs8->f32 accumulation is NOT supported by Mosaic
    (compile error) — the int32->f32 cast stays in the dequant.
  * ``pv_int8`` (SageAttention2-style int8 PV with per-row log2-domain
    P scales + per-channel V scales) is a measured NEGATIVE on v5e at
    this shape: 88.8-90.6 TFLOP/s vs int8-QK's 92.1 — with QK already
    int8 the kernel is VPU-bound (exp2 + quantize passes), so halving
    PV's MXU time buys nothing and the extra round/cast/dequant passes
    cost ~4%. Accuracy also drops (max-abs 0.013: int8 V's uniform
    step is ~0.5*sv on peaked rows). Kept as an opt-in for shapes/
    hardware where the MXU dominates.
  * ``exp_bf16`` on the int8 path (bf16 exp2 + no post-cast) is a
    measured near-wash: 92.3 vs 91.3 TFLOP/s (+1%) at max-abs 0.0037
    vs 0.0024 — the per-element exp2 width is NOT the VPU bottleneck;
    the remaining gap to the ~131 int8-QK ceiling is the per-tile
    QK->dequant->exp2->PV dependency chain itself. Flag kept, off by
    default.
  * ``fast_exp`` (fused Schraudolph bit-trick exp2: aux carries the
    dequant coeff and bias pre-scaled by 2^23, so the whole
    dequant+exp2 chain is one fma + converts + a bitcast) is ALSO a
    measured negative: 86.0 vs 88.3 TFLOP/s in the same run — together
    with exp_bf16's wash this pins the bottleneck on the convert/cast
    passes and MXU<->VPU serialization, not the exp2 op itself (TPU
    exp2 is hardware-assisted). s8xs8->f32 MXU accumulation, which
    would delete the s32->f32 convert, is rejected by Mosaic ("float
    acc with int lhs"). Flag kept opt-in (KANDINSKY5_TPU_FASTEXP) with
    interpret-mode accuracy coverage; max rel err ~2% vs int8's ~1.1%
    (normalizer cancels the mean multiplicative bias).
  * ROUND-5 CLOSURE — the int8 kernel is at its ceiling; the recorded
    95 TFLOP/s was a measurement artifact. Per-pass decomposition
    (tools/bench_i8_decomp.py, structurally-identical kernels with
    passes removed, v5e): exp2 pass 3.4 ms + dequant fma 0.6 ms out of
    139.9 ms full — the VPU chain costs ~3% and fully overlaps; QK+PV
    alone are ~140 ms at the measured MXU rates (16.25 TF raw int8 QK
    / 292 + 16.25 TF raw bf16 PV / 191 = 140.3 ms — both matmuls run
    128-lane-padded, so raw = 2x useful), i.e. the kernel core is at
    ~100% of the d=64 MXU roofline: 116.2 TFLOP/s useful ~= the ~115
    achievable ceiling. The earlier 95 number timed the UNJITTED
    flash_attention wrapper, whose eager _pack_int8 dispatch adds
    ~27 ms the production (jitted) path never pays — jit(q,k,v ->
    flash_attention(...)) measures 112.2 useful (pack+epilogue ~5 ms
    in-graph). The lag-1 kv-block software pipeline (``pipe=True``,
    _kernel_fixed_i8_pipe) was built and swept anyway: NEGATIVE at
    every (bq, bk, hp, exp_bf16) tried — best 90.9 vs 94.9 standalone
    (1536/512+ebf16; plain 81.1, 768/512 hp2 84.1, 1536/768 82.9) —
    the double-buffered VMEM score-tile round-trip (6-12 MiB live)
    shrinks the DMA windows and costs more than the exp2/PV overlap
    buys, exactly like the bf16 lag-1 negative. Kept opt-in
    (KANDINSKY5_TPU_I8_PIPE) with interpret-exact coverage; there is
    no remaining in-kernel lever short of fp8 hardware.

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

# measured on v5e at the 5s production shape (47,616 tokens, 28 heads):
# large q blocks amortize K/V streaming; the fixed-shift kernel runs 4
# heads per program (amortizing per-program overhead) with (1488, 768)
# blocks and the in-kernel normalize epilogue — 81.1 TFLOP/s useful
# (round-3 sweep: bk in {896, 1024, 1536} and bq in {744, 1536, 2976}
# all slower or VMEM-infeasible, bk 512/640 also slower for bf16 —
# unlike the int8 path, see BLOCK_K_I8; exp2-at-bf16 neutral — the VPU pass
# already overlaps the MXU; ~82% of the d=64 ceiling is the measured
# plateau for this QK->exp2->PV structure). The online kernel's extra
# row-stat scratch caps its kv block at 512 (VMEM)
BLOCK_Q = 1488
BLOCK_K = 768
BLOCK_K_I8 = 512   # int8-QK path (measured: 95.0 vs 92.6 TFLOP/s at 768;
# hp re-swept at bk=512: hp 2/7/14 and bk 640 all within noise of the
# auto pick, 93.5-94.4 — heads-per-program is saturated at this block)
BLOCK_K_ONLINE = 512
_STAT = 128   # lane-width replication for row statistics kept in VMEM
_NEG = -1e30  # effective -inf that keeps exp() NaN-free on masked rows


def flash_supported(q: Array, k: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return (q.shape[-1] in (64, 128, 256, 512)
            and q.dtype in (jnp.bfloat16, jnp.float32))


def _apply_masks(s, mask_ref, qid_ref, kid_ref, masked, ids_masked):
    if masked:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, _NEG)
    if ids_masked:
        # q ids are lane-replicated (block_q, 128), kv ids sublane-
        # replicated (8, block_k): the compare needs no VMEM relayout
        allowed = qid_ref[0][:, :1] >= kid_ref[0][:1, :]
        s = jnp.where(allowed, s, _NEG)
    return s


def _kernel_fixed(*refs, num_k: int, masked: bool, hp: int, dt: int,
                  norm: str, exp_bf16: bool, interleave: bool = False):
    if masked:
        q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, acc_ref = refs
        mask_ref = None
    """Fixed-shift softmax, fully MXU-folded.

    Inputs arrive 128-lane *augmented* (see ``_augment``): Q carries a
    ``-shift`` column against K's ones column, so the QK matmul emits
    ``s - shift`` directly (the K=128 contraction costs the same MXU
    time as the naive K=64 — the systolic array pads odd contractions);
    V carries a ones column, so the PV matmul accumulates the softmax
    normalizer in lane ``d`` for free (N=128 likewise costs the same as
    N=64). Per-element VPU work is exp2 + one cast; the normalize/slice
    epilogue runs outside the kernel as one fused XLA pass.

    (A lag-1 software pipeline that decoupled QK from exp2/PV via a
    scores scratch was measured SLOWER — the extra VMEM round-trip of
    the fp32 score tile outweighs any VPU/MXU overlap; the VPU pass is
    ~8% of the MXU time here.)
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # hp heads run per program (they share all control flow and the
    # text mask): halving the program count amortizes per-program
    # overhead — measured +3% at the 5s shape.

    def qk(h):
        # K arrives pre-transposed (d, block_k): the MXU reads its rhs
        # in native (K, N) layout, skipping a per-program XLU transpose.
        return jax.lax.dot_general(
            q_ref[h], k_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def consume(h, s):
        if masked:
            s = jnp.where(mask_ref[0, 0][None, :] != 0, s, _NEG)
        # scores arrive pre-scaled by log2(e) (see _augment): exp2 is
        # the native VPU transcendental, skipping exp's internal multiply.
        # exp_bf16 computes it at bf16 — the softmax weights were going
        # to round to bf16 for the PV matmul anyway (same 2^-8 relative
        # error), and the narrower VPU pass overlaps the MXU better.
        if exp_bf16:
            p = jnp.exp2(s.astype(v_ref.dtype))
        else:
            p = jnp.exp2(s).astype(v_ref.dtype)
        acc_ref[h] += jax.lax.dot_general(
            p, v_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if interleave and hp > 1:
        # issue head h+1's QK matmul BEFORE consuming head h's scores:
        # the exp2 VPU pass of head h then overlaps QK of h+1 on the
        # MXU in issue order (the across-j lag-1 pipeline via a scores
        # scratch was slower; this keeps s in values, no extra scratch).
        # MEASURED A WASH at the 5s shape (80.4 vs 80.3 control; the
        # extra live fp32 score tile VMEM-crashes hp=4 unless exp_bf16)
        # — Mosaic evidently already schedules across the dependency.
        # Kept OFF by default, retained for other shapes/hardware.
        s = qk(0)
        for h in range(hp):
            s_cur = s
            if h + 1 < hp:
                s = qk(h + 1)
            consume(h, s_cur)
    else:
        for h in range(hp):
            consume(h, qk(h))

    @pl.when(j == num_k - 1)
    def _finalize():
        if norm == "ext":
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)
        else:
            # normalize INSIDE the kernel on the fp32 accumulator (lane
            # ``dt`` carries the softmax row sum via V's ones column) and
            # emit bf16: out-traffic drops 4x (fp32 128-lane -> bf16
            # dt-lane) and the external divide pass disappears.
            for h in range(hp):
                acc = acc_ref[h]
                n = jnp.maximum(acc[:, dt:dt + 1], 1e-30)
                if norm == "in":
                    o_ref[h] = (acc[:, :dt] / n).astype(o_ref.dtype)
                else:  # "in_wide": full-lane store, sliced outside
                    o_ref[h] = (acc / n).astype(o_ref.dtype)


_LOG2_127 = math.log2(127.0)
# Schraudolph fast-exp2 constants (see _kernel_fixed_i8 ``fast_exp``):
# bitcast(int32((s + BIAS) * 2^23)) == 2^s with the mantissa linearly
# interpolating between exponent steps. The -0.0432 balances the
# one-sided linear-interp deficit (2^f <= 1+f on [0,1], max 5.97% at
# f=0.529) to a symmetric +-3% band; the softmax normalizer rides the
# SAME approximated weights, so the constant factor 2^-0.0432 and the
# mean multiplicative bias cancel exactly in the normalized output.
_FX_SCALE = 8388608.0            # 2^23
_FX_BIAS = 127.0 - 0.0432
_FX_MIN = 1.0 * 8388608.0        # biased exponent 1 -> 2^-126 (~0 weight)


def _kernel_fixed_i8(*refs, num_k: int, masked: bool, hp: int, dt: int,
                     pv8: bool = False, exp_bf16: bool = False,
                     fast_exp: bool = False):
    """SageAttention-style int8 QK^T fixed-shift kernel.

    The QK matmul runs s8xs8->s32 — the v5e MXU's int8 rate is ~2x bf16
    (measured 292 vs 191 T/s, tools/bench_int8mm.py), so the QK half of
    attention doubles while PV (bf16, full-width contraction) is
    unchanged. Q is quantized with one scale per (batch, head); K is
    mean-centered per head over tokens (softmax-invariant: the dropped
    q.k_mean term is constant along each score row) and quantized with
    one scale per token. ``aux`` row 0 carries the per-kv-token dequant
    coefficient sq*sk_j*log2(e)/sqrt(d); row 1 the fixed shift (already
    in log2 domain). The softmax normalizer still rides V's ones column
    (lane ``dt``) and the output is normalized in-kernel, as in
    _kernel_fixed's "in" mode.

    ``pv8`` additionally runs PV at s8xs8->s32 (SageAttention2-style):
    the softmax weights are quantized PER SCORE TILE in the log2 domain
    — p8 = round(exp2(s - m)) with m = max(s) - log2(127), so the
    tile's largest weight maps to 127 regardless of how diffuse the
    attention is (a fixed 1/127 step against the global bound would
    drown diffuse rows, the regime random-weight benches live in). V is
    quantized per output channel outside the kernel; ``svec`` carries
    the per-channel dequant scales (the ones/normalizer column's slot
    holds exactly 1/127). Per-tile dequant is one rank-1 f32 multiply
    folded into the accumulate.
    """
    if pv8:
        if masked:
            (q_ref, k_ref, v_ref, aux_ref, svec_ref, mask_ref,
             o_ref, acc_ref) = refs
        else:
            q_ref, k_ref, v_ref, aux_ref, svec_ref, o_ref, acc_ref = refs
            mask_ref = None
    elif masked:
        q_ref, k_ref, v_ref, aux_ref, mask_ref, o_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, aux_ref, o_ref, acc_ref = refs
        mask_ref = None
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for h in range(hp):
        s32 = jax.lax.dot_general(
            q_ref[h], k_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if fast_exp and not pv8:
            # Fused dequant + Schraudolph exp2: aux rows 2/3 carry the
            # dequant coefficient and (BIAS - shift) pre-scaled by 2^23,
            # so weight = bitcast(int32(s32*c23 + b23)) is ONE fma + two
            # converts + a bitcast instead of dequant-fma + the ~8-op
            # exp2 polynomial — the kernel is VPU-bound on exactly this
            # chain (module docstring), the MXU halves are untouched.
            c23 = aux_ref[h, 2:3, :]
            b23 = aux_ref[h, 3:4, :]
            si = s32.astype(jnp.float32) * c23 + b23
            if masked:
                si = jnp.where(mask_ref[0, 0][None, :] != 0, si, _FX_MIN)
            # clamp keeps the biased exponent >= 1: scores below -126
            # (or the masked sentinel) map to 2^-126, an inert weight
            si = jnp.maximum(si, _FX_MIN)
            p = jax.lax.bitcast_convert_type(
                si.astype(jnp.int32), jnp.float32).astype(v_ref.dtype)
            acc_ref[h] += jax.lax.dot_general(
                p, v_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            continue
        c = aux_ref[h, 0:1, :]       # (1, bk) dequant coefficient
        # shift is lane-replicated in aux row 1: slicing the full row
        # keeps the broadcast single-axis (Mosaic rejects a (1,1) ->
        # (bq, bk) broadcast in both sublanes and lanes at small blocks)
        bsh = aux_ref[h, 1:2, :]     # (1, bk) log2-domain shift
        s = s32.astype(jnp.float32) * c - bsh
        if masked:
            s = jnp.where(mask_ref[0, 0][None, :] != 0, s, _NEG)
        if pv8:
            # per-ROW log2-domain quantization: each row's in-tile max
            # maps to 127 (a tile-wide scalar max crushes diffuse rows
            # that share a tile with a peaked one — measured 10x worse);
            # an all-masked row gives m = _NEG - log2(127) and a zero
            # dequant factor exp2(m), so its garbage p8 is inert
            m = jnp.max(s, axis=1, keepdims=True) - _LOG2_127
            p8 = jnp.round(jnp.exp2(s - m)).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p8, v_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc_ref[h] += (pv.astype(jnp.float32)
                           * (jnp.exp2(m) * svec_ref[h, 0:1, :]))
        else:
            if exp_bf16:
                # this kernel is VPU-bound (the MXU halves are int8-fast
                # already): computing exp2 at bf16 halves the dominant
                # VPU pass AND drops the f32->bf16 post-cast. exp2's arg
                # is a log2-domain score <= 0, so bf16's 8 mantissa bits
                # cost ~0.4% relative on p — measured accuracy recorded
                # in tools/bench_flash_i8.py
                p = jnp.exp2(s.astype(jnp.bfloat16))
            else:
                p = jnp.exp2(s).astype(v_ref.dtype)
            acc_ref[h] += jax.lax.dot_general(
                p, v_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == num_k - 1)
    def _finalize():
        for h in range(hp):
            acc = acc_ref[h]
            n = jnp.maximum(acc[:, dt:dt + 1], 1e-30)
            o_ref[h] = (acc[:, :dt] / n).astype(o_ref.dtype)


def _kernel_fixed_i8_pipe(*refs, num_k: int, masked: bool, hp: int, dt: int,
                          exp_bf16: bool):
    """Lag-1 kv-block software pipeline over _kernel_fixed_i8's math.

    The plain int8 kernel's per-block dependency chain
    QK(s8xs8->s32, MXU) -> dequant (VPU) -> exp2 (VPU) -> PV (bf16 MXU)
    serializes the VPU passes against both MXU halves within each grid
    step (the module docstring pins the 95 vs ~115 TFLOP/s residue on
    exactly this chain). Here the chain is split across grid steps with
    a double-buffered VMEM score scratch: step j PRODUCES block j's
    dequanted log2-domain scores (QK + dequant + mask) into scr[j%2]
    and CONSUMES block j-1's from scr[(j-1)%2] (exp2 + PV) — the two
    halves have no data dependency inside a step, so Mosaic can overlap
    block j's int8 QK matmul with block j-1's exp2/PV. One extra grid
    step drains the last block (V's index map lags one block behind for
    the consume half; K/aux/mask clamp at the last block for the dead
    produce).

    The math and accumulation order are IDENTICAL to _kernel_fixed_i8
    (tests/test_pallas_interpret.py asserts exact equality in fp32
    scratch mode). The fp32 score tile costs 2*bq*bk*4 VMEM bytes
    (bf16 when exp_bf16 — same rounding the PV matmul applies anyway).
    """
    if masked:
        q_ref, k_ref, v_ref, aux_ref, mask_ref, o_ref, acc_ref, s0, s1 = refs
    else:
        q_ref, k_ref, v_ref, aux_ref, o_ref, acc_ref, s0, s1 = refs
        mask_ref = None
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def produce(scr):
        for h in range(hp):
            s32 = jax.lax.dot_general(
                q_ref[h], k_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            c = aux_ref[h, 0:1, :]
            bsh = aux_ref[h, 1:2, :]
            s = s32.astype(jnp.float32) * c - bsh
            if masked:
                s = jnp.where(mask_ref[0, 0][None, :] != 0, s, _NEG)
            scr[h] = s.astype(scr.dtype)

    def consume(scr):
        for h in range(hp):
            if exp_bf16:
                p = jnp.exp2(scr[h])          # scratch already bf16
            else:
                p = jnp.exp2(scr[h]).astype(v_ref.dtype)
            acc_ref[h] += jax.lax.dot_general(
                p, v_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    even = j % 2 == 0

    @pl.when(jnp.logical_and(j < num_k, even))
    def _prod0():
        produce(s0)

    @pl.when(jnp.logical_and(j < num_k, jnp.logical_not(even)))
    def _prod1():
        produce(s1)

    # consuming block j-1, whose parity is (j-1)%2 == (j+1)%2
    @pl.when(jnp.logical_and(j > 0, jnp.logical_not(even)))
    def _cons0():
        consume(s0)

    @pl.when(jnp.logical_and(j > 0, even))
    def _cons1():
        consume(s1)

    @pl.when(j == num_k)
    def _finalize():
        for h in range(hp):
            acc = acc_ref[h]
            n = jnp.maximum(acc[:, dt:dt + 1], 1e-30)
            o_ref[h] = (acc[:, :dt] / n).astype(o_ref.dtype)


def _kernel_online(live_ref, q_ref, k_ref, v_ref, mask_ref, qid_ref, kid_ref,
                   shift_ref, o_ref, acc_ref, l_ref, m_ref, *, scale: float,
                   num_k: int, heads: int, masked: bool, ids_masked: bool):
    """Classic running-max online softmax (for un-normed QK).

    ``live_ref`` is the scalar-prefetched (B, n_qb, n_kb) liveness table
    (segment-id monotonicity: block-max qid >= block-min kid); fully
    id-masked tiles skip both matmuls — the VAE's frame-causal
    attention is ~half dead tiles.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(live_ref[b // heads, i, j] != 0)
    def _update():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = _apply_masks(s, mask_ref, qid_ref, kid_ref, masked, ids_masked)
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


@functools.partial(jax.jit, static_argnames=(
    "masked", "block_q", "block_k", "norm", "hp_opt", "exp_bf16",
    "interleave", "interpret"))
def _flash_fixed_bhld(q: Array, k: Array, v: Array, mask: Array,
                      masked: bool, block_q: int, block_k: int,
                      norm: str = "in", hp_opt: Optional[int] = None,
                      exp_bf16: bool = False, interleave: bool = False,
                      interpret: bool = False) -> Array:
    """(BH, L, 128) augmented fixed-shift core (see _kernel_fixed).

    ``k`` arrives TRANSPOSED as (BH, 128, Lk) so each kv block loads in
    the MXU's native rhs (K, N) layout.

    ``norm``: "in" (default) normalizes inside the kernel and emits a
    bf16 (bh, lq, d_true) output; "in_wide" normalizes in-kernel but
    stores all 128 lanes; "ext" emits the raw fp32 accumulator (128
    lanes) for an external divide — the round-2 behavior, kept for A/B.
    """
    bh, lq, d = q.shape
    assert d % 128 == 0 and k.shape[1] == d and v.shape[2] == d
    dt = d - 64  # true head dim; lane dt holds the softmax normalizer
    lk = k.shape[2]
    num_k = lk // block_k
    h = bh // mask.shape[0]
    # several heads per program when they tile evenly AND the group never
    # straddles a batch boundary (heads are bh-major: batch b owns rows
    # [b*h, (b+1)*h))
    if hp_opt is not None:
        hp = hp_opt if (bh % hp_opt == 0 and h % hp_opt == 0) else 1
    else:
        # round-3 sweep at the 5s shape: hp=4 81.1, hp=2 79.2, hp=7
        # 80.2 TFLOP/s useful — prefer 4, fall back 2, then 1; bounded
        # by (a) a buffer estimate (q + k + v + acc + out,
        # double-buffered) and (b) the fp32 score tile, whose size is
        # the measured compile boundary: (1488, 768) tiles (4.6 MiB)
        # compile at hp=4 while (2976, 768) tiles (9.1 MiB) crash the
        # Mosaic allocator even at hp=2 — gate multi-head at 6 MiB
        hp = 1
        if block_q * block_k * 4 < 6 * 2**20:
            for cand in (4, 2):
                vmem = cand * (2 * block_q * d * 2 + 4 * d * block_k * 2
                               + block_q * d * 4 + 2 * block_q * d * 2)
                if bh % cand == 0 and h % cand == 0 and vmem < 13 * 2**20:
                    hp = cand
                    break
    grid = (bh // hp, lq // block_q, num_k)
    kernel = functools.partial(_kernel_fixed, num_k=num_k, masked=masked,
                               hp=hp, dt=dt, norm=norm, exp_bf16=exp_bf16,
                               interleave=interleave)
    flops = 4 * lq * lk * d * bh
    in_specs = [
        pl.BlockSpec((hp, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, d, block_k), lambda b, i, j: (b, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if masked:
        # the mask input (and its per-program fetch) exists only when
        # something is actually masked — the full-length unmasked
        # self-attention path measured ~2% faster without it
        in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda b, i, j, hp=hp, h=h: ((b * hp) // h, 0, j),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    if norm == "in":
        out_shape = jax.ShapeDtypeStruct((bh, lq, dt), q.dtype)
        out_block = (hp, block_q, dt)
    elif norm == "in_wide":
        out_shape = jax.ShapeDtypeStruct((bh, lq, d), q.dtype)
        out_block = (hp, block_q, d)
    else:
        # f32 out: the normalizer lane must not round to bf16 before the
        # external epilogue divide (0.4% per-row scale error otherwise)
        out_shape = jax.ShapeDtypeStruct((bh, lq, d), jnp.float32)
        out_block = (hp, block_q, d)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((hp, block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # bh/q-block dims are independent; kv is the softmax reduction
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=lq * lk * bh),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=(
    "masked", "block_q", "block_k", "exp_bf16", "fast_exp", "interpret"))
def _flash_i8_bhld(q8: Array, k8: Array, v: Array, aux: Array, mask: Array,
                   masked: bool, block_q: int, block_k: int,
                   svec: Optional[Array] = None, exp_bf16: bool = False,
                   fast_exp: bool = False,
                   interpret: bool = False) -> Array:
    """(BH, L, 128) int8-QK fixed-shift core (see _kernel_fixed_i8).

    ``q8`` (bh, lq, 128) s8; ``k8`` TRANSPOSED (bh, 128, lk) s8;
    ``v`` (bh, lk, 128) bf16 augmented with the ones column — or s8
    when ``svec`` (bh, 8, 128) per-channel dequant scales are passed
    (the int8-PV mode, see the kernel's ``pv8`` docstring);
    ``aux`` (bh, 8, lk) f32 — row 0 dequant coefficients, row 1 shift.
    """
    pv8 = svec is not None
    bh, lq, d = q8.shape
    assert d % 128 == 0 and k8.shape[1] == d and v.shape[2] == d
    dt = d - 64
    lk = k8.shape[2]
    num_k = lk // block_k
    h = bh // mask.shape[0]
    # int8 sublane tiles are 32 deep: q blocks must be %32 (block_q is
    # forced to a 32-multiple by the caller); 4 heads per program as in
    # the bf16 kernel, gated by the same VMEM estimate
    vb = 1 if pv8 else 2  # V bytes/elem
    hp = 1
    if block_q * block_k * 4 < 6 * 2**20:
        for cand in (4, 2):
            vmem = cand * (2 * block_q * d + 2 * d * block_k
                           + 2 * block_k * d * vb
                           + block_q * d * 4 + 2 * block_q * d * 2)
            if bh % cand == 0 and h % cand == 0 and vmem < 13 * 2**20:
                hp = cand
                break
    grid = (bh // hp, lq // block_q, num_k)
    kernel = functools.partial(_kernel_fixed_i8, num_k=num_k, masked=masked,
                               hp=hp, dt=dt, pv8=pv8, exp_bf16=exp_bf16,
                               fast_exp=fast_exp)
    flops = 4 * lq * lk * d * bh
    in_specs = [
        pl.BlockSpec((hp, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, d, block_k), lambda b, i, j: (b, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, 8, block_k), lambda b, i, j: (b, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [q8, k8, v, aux]
    if pv8:
        in_specs.append(
            pl.BlockSpec((hp, 8, 128), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(svec)
    if masked:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda b, i, j, hp=hp, h=h: ((b * hp) // h, 0, j),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hp, block_q, dt), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bh, lq, dt), jnp.bfloat16 if pv8 else v.dtype),
        scratch_shapes=[pltpu.VMEM((hp, block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q8.size + k8.size + 2 * v.size,
            transcendentals=0 if fast_exp else lq * lk * bh),
        interpret=interpret,
    )(*args)


def _pack_int8(qf: Array, kf: Array, vf: Array, d: int, pv8: bool = False):
    """Quantize Q/K for the int8 QK kernel (one fused XLA pre-pass,
    O(S.D) vs the O(S^2) kernel).

    K is mean-centered over tokens per (batch, head) before quantizing
    — softmax scores change by a per-row constant q.k_mean, which the
    softmax cancels (SageAttention's smoothing; K after RoPE has
    strongly nonzero per-dim means, centering roughly halves the
    quantization step). Scales: per-(batch, head) for Q (rows are
    QK-RMSNorm'd so their dynamic range is tight), per-token for K.
    Returns (q8, k8_transposed, v_augmented, aux) — see _flash_i8_bhld.
    """
    bh, lq, _ = qf.shape
    lk = kf.shape[1]
    scale = math.log2(math.e) / math.sqrt(d)
    qf32 = qf.astype(jnp.float32)
    kf32 = kf.astype(jnp.float32)
    km = jnp.mean(kf32, axis=1, keepdims=True)
    kc = kf32 - km
    sq = jnp.maximum(jnp.max(jnp.abs(qf32), axis=(1, 2)), 1e-6) / 127.0
    sk = jnp.maximum(jnp.max(jnp.abs(kc), axis=-1), 1e-6) / 127.0
    q8 = jnp.clip(jnp.round(qf32 / sq[:, None, None]), -127, 127)
    k8 = jnp.clip(jnp.round(kc / sk[..., None]), -127, 127)
    pad_q = jnp.zeros((bh, lq, 64), jnp.int8)
    pad_k = jnp.zeros((bh, lk, 64), jnp.int8)
    q8 = jnp.concatenate([q8.astype(jnp.int8), pad_q], axis=-1)
    k8 = jnp.concatenate([k8.astype(jnp.int8), pad_k], axis=-1)
    k8 = k8.transpose(0, 2, 1)
    # shift: upper bound on the log2-domain scores of the CENTERED K
    qn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(qf32), axis=-1)))
    kn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(kc), axis=-1)))
    shift = qn * kn * scale
    coeff = sq[:, None] * sk * scale                     # (bh, lk)
    # rows 2/3: the same (coeff, shift) pre-fused with the Schraudolph
    # constants for the kernel's fast_exp path (see _kernel_fixed_i8)
    aux = jnp.stack([
        coeff,
        jnp.broadcast_to(shift, (bh, lk)),
        coeff * _FX_SCALE,
        jnp.broadcast_to((_FX_BIAS - shift) * _FX_SCALE, (bh, lk)),
    ], axis=1)
    aux = jnp.pad(aux, ((0, 0), (0, 4), (0, 0)))          # (bh, 8, lk) f32
    if pv8:
        # per-out-channel V quantization; the ones/normalizer column is
        # stored as exactly 127 with scale 1/127 (svec's slot), so the
        # softmax row sum still rides lane d losslessly
        vf32 = vf.astype(jnp.float32)
        sv = jnp.maximum(jnp.max(jnp.abs(vf32), axis=1), 1e-6) / 127.0
        v8 = jnp.clip(jnp.round(vf32 / sv[:, None, :]),
                      -127, 127).astype(jnp.int8)
        ones8 = jnp.full((bh, lk, 1), 127, jnp.int8)
        zv8 = jnp.zeros((bh, lk, 63), jnp.int8)
        va = jnp.concatenate([v8, ones8, zv8], axis=-1)
        svec = jnp.concatenate(
            [sv, jnp.full((bh, 1), 1.0 / 127.0, jnp.float32),
             jnp.ones((bh, 63), jnp.float32)], axis=-1)
        svec = jnp.broadcast_to(svec[:, None, :], (bh, 8, 128))
        return q8, k8, va, aux, svec
    ones = jnp.ones((bh, lk, 1), vf.dtype)
    zv = jnp.zeros((bh, lk, 63), vf.dtype)
    va = jnp.concatenate([vf, ones, zv], axis=-1)
    return q8, k8, va, aux, None


@functools.partial(jax.jit, static_argnames=(
    "masked", "block_q", "block_k", "exp_bf16", "hp_opt", "interpret"))
def _flash_i8_pipe_bhld(q8: Array, k8: Array, v: Array, aux: Array,
                        mask: Array, masked: bool, block_q: int, block_k: int,
                        exp_bf16: bool = False, hp_opt: Optional[int] = None,
                        interpret: bool = False) -> Array:
    """(BH, L, 128) int8-QK lag-1 pipelined core (_kernel_fixed_i8_pipe).

    Same inputs as _flash_i8_bhld; the grid gains one drain step and V's
    index map lags one kv block behind K's (the consume half processes
    block j-1 while the produce half computes block j's scores).
    """
    bh, lq, d = q8.shape
    assert d % 128 == 0 and k8.shape[1] == d and v.shape[2] == d
    dt = d - 64
    lk = k8.shape[2]
    num_k = lk // block_k
    h = bh // mask.shape[0]
    sb = 2 if exp_bf16 else 4  # scratch bytes/elem
    # the double-buffered score scratch dominates VMEM: gate hp on the
    # full budget (blocks double-buffered by the pipeline + acc + scratch)
    hp = 1
    if hp_opt is not None:
        hp = hp_opt if (bh % hp_opt == 0 and h % hp_opt == 0) else 1
    else:
        for cand in (2,):
            vmem = (cand * (2 * block_q * d + 2 * d * block_k
                            + 2 * block_k * d * 2
                            + block_q * d * 4 + 2 * block_q * dt * 2)
                    + 2 * cand * block_q * block_k * sb)
            if bh % cand == 0 and h % cand == 0 and vmem < 12 * 2**20:
                hp = cand
                break
    grid = (bh // hp, lq // block_q, num_k + 1)
    nk1 = num_k - 1
    kernel = functools.partial(_kernel_fixed_i8_pipe, num_k=num_k,
                               masked=masked, hp=hp, dt=dt,
                               exp_bf16=exp_bf16)
    flops = 4 * lq * lk * d * bh
    in_specs = [
        pl.BlockSpec((hp, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        # K/aux/mask clamp at the last block: the drain step (j == num_k)
        # never reads them, and the repeated index elides the DMA
        pl.BlockSpec((hp, d, block_k),
                     lambda b, i, j: (b, 0, jnp.minimum(j, nk1)),
                     memory_space=pltpu.VMEM),
        # V lags one block: the consume half at step j runs block j-1
        pl.BlockSpec((hp, block_k, d),
                     lambda b, i, j: (b, jnp.maximum(j - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, 8, block_k),
                     lambda b, i, j: (b, 0, jnp.minimum(j, nk1)),
                     memory_space=pltpu.VMEM),
    ]
    args = [q8, k8, v, aux]
    if masked:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda b, i, j, hp=hp, h=h:
                         ((b * hp) // h, 0, jnp.minimum(j, nk1)),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    scr_dtype = jnp.bfloat16 if exp_bf16 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hp, block_q, dt), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, dt), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((hp, block_q, d), jnp.float32),
            pltpu.VMEM((hp, block_q, block_k), scr_dtype),
            pltpu.VMEM((hp, block_q, block_k), scr_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q8.size + k8.size + 2 * v.size,
            transcendentals=lq * lk * bh),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=(
    "masked", "ids_masked", "block_q", "block_k", "interpret"))
def _flash_bhld(q: Array, k: Array, v: Array, mask: Array, q_ids: Array,
                kv_ids: Array, shift: Array, masked: bool, ids_masked: bool,
                block_q: int, block_k: int,
                interpret: bool = False) -> Array:
    """(BH, L, D) online-softmax flash attention core."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    num_k = lk // block_k
    n_qb = lq // block_q
    h = bh // mask.shape[0]
    b = mask.shape[0]
    grid = (bh, n_qb, num_k)
    # per-(q-block, kv-block) liveness from the segment-id monotonicity:
    # a tile is dead iff its max q id < its min kv id. Scalar-prefetched
    # to SMEM so the kernel can branch before touching the MXU.
    if ids_masked:
        qmax = q_ids[:, :, 0].reshape(b, n_qb, block_q).max(axis=-1)
        kmin = kv_ids[:, 0, :].reshape(b, num_k, block_k).min(axis=-1)
        live = (qmax[:, :, None] >= kmin[:, None, :]).astype(jnp.int32)
    else:
        live = jnp.ones((b, n_qb, num_k), jnp.int32)
    scratch = [
        pltpu.VMEM((block_q, d), jnp.float32),
        pltpu.VMEM((block_q, _STAT), jnp.float32),
        pltpu.VMEM((block_q, _STAT), jnp.float32),
    ]
    kw = dict(scale=scale, num_k=num_k, heads=h, masked=masked,
              ids_masked=ids_masked)
    kernel = functools.partial(_kernel_online, **kw)
    flops = 4 * lq * lk * d * bh
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j, *_: (b // h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128),
                         lambda b, i, j, *_: (b // h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_k), lambda b, i, j, *_: (b // h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # bh/q-block dims are independent; kv is the softmax reduction
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=lq * lk * bh),
        interpret=interpret,
    )(live, q, k, v, mask, q_ids, kv_ids, shift)


def _pad_to(x: Array, axis: int, mult: int, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), n


def score_bound(q: Array, k: Array) -> Array:
    """Upper bound on softmax scores: max_i ||q_i|| * max_j ||k_j|| / sqrt(D).
    One cheap fused reduction over Q and K (O(S·D) vs the O(S²·D) kernel)."""
    d = q.shape[-1]
    qn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)))
    kn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)))
    return (qn * kn / math.sqrt(d)).reshape(1)


def _augment(qf: Array, kf: Array, vf: Array, shift: Array, d: int):
    """Pack scale/shift/normalizer into the spare lanes of a d%128==64
    head (one fused XLA pass per tensor, O(S·D) vs the O(S²) kernel):

      q' = [q/sqrt(d), -shift, 0...]   k' = [k, 1, 0...]   v' = [v, 1, 0...]

    so q'·k' = s - shift (the QK matmul absorbs scale and shift) and
    p·v' carries the softmax normalizer in lane d (the PV matmul absorbs
    the row sum). The widened K=N=128 contractions cost the same MXU
    time as d=64 — the systolic array pads odd dimensions anyway.

    K is returned TRANSPOSED (bh, 128, lk): the kernel's QK matmul then
    reads its rhs in the MXU-native (K, N) layout instead of paying a
    per-program XLU transpose of every kv block.
    """
    bh, lq, _ = qf.shape
    lk = kf.shape[1]
    aug = d + 64
    # fold softmax scale AND the exp->exp2 base change into q: the
    # kernel then computes exp2(q'k' ) = exp(s/sqrt(d) - shift)
    scale = math.log2(math.e) / math.sqrt(d)
    zq = jnp.zeros((bh, lq, aug - d - 1), qf.dtype)
    zk = jnp.zeros((bh, lk, aug - d - 1), kf.dtype)
    ones = jnp.ones((bh, lk, 1), kf.dtype)
    neg_shift = jnp.broadcast_to(
        -shift * math.log2(math.e), (bh, lq, 1)).astype(qf.dtype)
    qa = jnp.concatenate([qf * scale, neg_shift, zq], axis=-1)
    ka = jnp.concatenate([kf, ones, zk], axis=-1).transpose(0, 2, 1)
    va = jnp.concatenate([vf, ones, zk], axis=-1)
    return qa, ka, va


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    q_ids: Optional[Array] = None,
    kv_ids: Optional[Array] = None,
    block_q: int = BLOCK_Q,
    block_k: int = BLOCK_K,
    fixed_shift: bool = True,
    norm: str = "in",
    hp_opt: Optional[int] = None,
    exp_bf16: bool = False,
    interleave: bool = False,
    qk_int8: bool = False,
    pv_int8: bool = False,
    fast_exp: bool = False,
    pipe: Optional[bool] = None,
    interpret: bool = False,
) -> Array:
    """(B, L, H, D) flash attention.

    kv_mask: (B, Lk) bool key validity. q_ids/kv_ids: (B, L) int32
    non-decreasing segment ids; query i attends key j iff
    q_id[i] >= kv_id[j] (causal: ids = arange; VAE frame-causal: ids =
    frame index). ``fixed_shift`` selects the bounded-score softmax —
    only valid when scores are bounded (QK-RMSNorm'd inputs).
    ``qk_int8`` further quantizes the QK^T matmul to s8xs8->s32
    (SageAttention-style; ~2x MXU rate on the QK half) — an accuracy
    trade the caller opts into; see _pack_int8 for the error story.
    ``pv_int8`` (implies qk_int8) additionally quantizes PV with
    per-score-tile log2-domain P scales + per-channel V scales
    (SageAttention2-style) — see _kernel_fixed_i8's ``pv8``.
    ``fast_exp`` (int8 path only) replaces the exp2 polynomial with the
    fused Schraudolph bit-trick — +-3% per-weight (normalizer-cancelled
    in the mean); accuracy is measured live by bench.py's PSNR gate.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    # the augmented fixed-shift layout needs the 64 spare lanes of a
    # d=64 head; other widths and id-masked callers take the online path
    if q_ids is not None or d % 128 != 64:
        fixed_shift = False
    # short sequences (text self/cross attention: 256 tokens vs the
    # 1536-wide default blocks) would otherwise pad K/V 6x and compute
    # masked garbage; clamp blocks to the 128-rounded true length
    block_q = min(block_q, -(-lq // 128) * 128)
    block_k = min(block_k, -(-lk // 128) * 128)
    qk_int8 = qk_int8 or pv_int8
    if fixed_shift and qk_int8 and block_q % 32:
        # int8 sublane tiles are 32 deep -> q blocks must be 32-aligned
        # (any 128-multiple is); 1536 divides the 5s production length
        # 47,616 exactly, unlike the bf16 default 1488
        block_q = min(1536, -(-lq // 128) * 128)
    if fixed_shift and qk_int8 and block_k == BLOCK_K:
        # int8 sweep at the 5s shape (round 3): kv block 512 beats the
        # bf16-tuned 768 (95.0 vs 92.6 TFLOP/s; 384/640/256 and other
        # bq all slower) — the int8 QK half streams K faster, so the
        # smaller score tile wins on VPU-chain locality
        block_k = min(BLOCK_K_I8, -(-lk // 128) * 128)
    if not fixed_shift:
        # the online kernel's fp32 score tile + row stats exceed VMEM at
        # the fixed path's wider kv block; wide heads (the VAE's d=512
        # mid attention) additionally need a shorter q block — the fp32
        # accumulator alone is block_q*d*4 bytes
        block_k = min(block_k, BLOCK_K_ONLINE)
        if d >= 256:
            block_q = min(block_q, 768)

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
    # (B, 1, Lk_pad); the kernel index maps divide the bh grid index by
    # the head count, so per-head replication is never materialized
    mask = mask_b[:, None, :]

    if fixed_shift and qk_int8:
        q8, k8, va, aux, svec = _pack_int8(qf, kf, vf, d, pv8=pv_int8)
        if pipe is None:
            import os

            pipe = os.environ.get("KANDINSKY5_TPU_I8_PIPE", "0") == "1"
        if pipe and not pv_int8 and not fast_exp:
            out = _flash_i8_pipe_bhld(q8, k8, va, aux, mask, masked,
                                      block_q, block_k, exp_bf16=exp_bf16,
                                      hp_opt=hp_opt, interpret=interpret)
        else:
            out = _flash_i8_bhld(q8, k8, va, aux, mask, masked,
                                 block_q, block_k, svec=svec,
                                 exp_bf16=exp_bf16,
                                 fast_exp=fast_exp and not pv_int8,
                                 interpret=interpret)
        out = out[:, :lq_orig]
        return out.reshape(b, h, lq_orig, d).transpose(0, 2, 1, 3)

    if fixed_shift:
        shift = score_bound(qf, kf)
        qa, ka, va = _augment(qf, kf, vf, shift, d)
        raw = _flash_fixed_bhld(qa, ka, va, mask, masked, block_q, block_k,
                                norm=norm, hp_opt=hp_opt, exp_bf16=exp_bf16,
                                interleave=interleave, interpret=interpret)
        if norm == "in":
            out = raw[:, :lq_orig]  # already normalized bf16 (bh, lq, d)
        elif norm == "in_wide":
            out = raw[:, :lq_orig, :d]
        else:
            raw = raw[:, :lq_orig]
            # lane d holds the softmax normalizer (ones column of V)
            out = (raw[..., :d]
                   / jnp.maximum(raw[..., d:d + 1], 1e-30)).astype(q.dtype)
        return out.reshape(b, h, lq_orig, d).transpose(0, 2, 1, 3)

    ids_masked = q_ids is not None
    if ids_masked:
        # pad kv ids with a huge id so padded keys never pass the >= test;
        # q-id layout is lane-replicated, kv-id layout sublane-replicated
        # (see _apply_masks)
        qi = q_ids.astype(jnp.int32)
        ki = kv_ids.astype(jnp.int32)
        qi, _ = _pad_to(qi, 1, block_q, value=2**30)
        ki, _ = _pad_to(ki, 1, block_k, value=2**30)
        qi = jnp.broadcast_to(qi[:, :, None], (b, qi.shape[1], 128))
        ki = jnp.broadcast_to(ki[:, None, :], (b, 8, lk_pad))
    else:
        qi = jnp.zeros((b, qf.shape[1], 128), jnp.int32)
        ki = jnp.zeros((b, 8, lk_pad), jnp.int32)

    shift = jnp.zeros((1,), jnp.float32)
    out = _flash_bhld(qf, kf, vf, mask, qi, ki, shift, masked, ids_masked,
                      block_q, block_k, interpret=interpret)
    out = out[:, :lq_orig]
    return out.reshape(b, h, lq_orig, d).transpose(0, 2, 1, 3)
