"""Pallas TPU implicit-GEMM 3x3x3 causal conv — the VAE decoder's
DEFAULT conv path on TPU (models/vae._conv_pallas_on).

XLA's conv_general_dilated runs the HunyuanVideo decoder's convs at
48-95 TFLOP/s on v5e; this kernel reformulates the conv as 27 shifted
(rows, Cin) @ (Cin, Cout) matmuls accumulated in VMEM — the MXU-native
decomposition — at a measured 102-135 TFLOP/s across the six decoder
shape classes, and can fuse the resnet prologue (GroupNorm's folded
per-channel scale/shift + SiLU, models/vae.py) into the same pass.

HISTORY: round 3 ran the kernel only at the Cout=128 full-res shapes
and the full decode REGRESSED 17.0 -> 37.7 s — the custom call pins
operands to the default layout and XLA re-lays the activation tensor
out around every Pallas<->XLA boundary. The round-4 chain experiment
isolated it (back-to-back Pallas 101.5 TFLOP/s, XLA 68.8, MIXED 53.5),
so coverage was extended to ALL decoder 3x3x3 convs via Cout blocking
and adoption is whole-tower: stream decode 9.5 -> 7.5 s at the 5s
shape. (A dw-folded im2col variant with K=3*Cin feeds was also tried:
Mosaic compiles it 5x slower and VMEM-OOMs at the production shape.)

Scope (the decoder's measured hot set, models/vae.py:265-282):
  * kernel 3x3x3, stride 1, NDHWC, bf16, Cin/Cout in {128, 256, 512}
    (Cout blocked to fit VMEM). Other shapes keep the XLA path.
  * replicate padding is pre-applied by the caller (one XLA edge-pad of
    the RAW input — per-channel scale/shift and SiLU commute with
    replication, so fusing them after the pad is exact).

Layout: x_pad (T+2, H+2, W+2, Cin) stays in HBM (ANY); each program
DMAs its (3, BH+2, BW+2, Cin) halo window into a double-buffered VMEM
scratch — halo windows overlap, which BlockSpec tiling cannot express.
The next program's DMA is issued before the current compute so the copy
hides behind the 27 matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


_VMEM_BUDGET = 14_500_000  # bytes of estimated scoped VMEM to admit
_VMEM_FUDGE = 1.45  # measured scoped-alloc / naive-sum ratio (r4, v5e)


def _pick_tiles(w: int, cin: int, cout: int, bh: int = 8,
                quant: bool = False):
    """(bw, cb): W tile + Cout block under the VMEM budget, or (0, 0).

    Estimated scoped VMEM = double-buffered halo input
    (2 x 3 x (bh+2) x (bw+8) x cin bf16) + the weight slice
    (27 x cin x cb bf16) + double-buffered out tile + fp32 accumulator,
    times the measured fudge (Mosaic's actual scoped allocation ran
    1.42x the naive sum on v5e — slice temporaries and pipeline
    bookkeeping). cb < cout (Cout blocking) extends the kernel to
    512-channel stages: the 2-D grid revisits the same input tile once
    per weight slice (no re-DMA — the tile stays in scratch across the
    inner cout-block iterations). The fused GN+SiLU input transform
    adds ~2 live fp32 per-time-plane temporaries on top (counted
    outside the fudge — they are exact, not bookkeeping). ``quant``
    adds the int8 quantized copy of the halo buffer (+cin/2 bytes per
    element) and halves the weight slice."""
    for bw in (256, 192, 128, 96, 64, 48, 32):
        if w % bw:
            continue
        in_bytes = 2 * 3 * (bh + 2) * (bw + 8) * cin * 2
        fuse_tmp = 2 * (bh + 2) * (bw + 8) * cin * 4
        if quant:
            in_bytes = in_bytes * 3 // 2  # + int8 double-buffered copy
        for cb in (cout, 256, 128):
            if cb > cout or cout % cb:
                continue
            w_bytes = 27 * cin * cb * (1 if quant else 2)
            out_bytes = 2 * bh * bw * cb * 2 + bh * bw * cb * 4
            est = _VMEM_FUDGE * (in_bytes + w_bytes + out_bytes) + fuse_tmp
            if est <= _VMEM_BUDGET:
                return bw, cb
    return 0, 0


def _auto_bh(h: int, w: int, cin: int, cout: int, quant: bool = False) -> int:
    """Row-tile height. Default 8; KANDINSKY5_TPU_CONV_BH16=1 opts into
    16-row tiles where the VMEM budget admits them.

    16 rows is a measured END-TO-END NEGATIVE on v5e (round 5): in
    per-call sync-timed isolation the dominant full-res 128->128 conv
    looks 29% faster at bh=16 (98.7 -> 76.3 ms; bh=32 a wash at 77.3,
    256->256 at 81 TF/s, 512-channel stages don't fit 16 rows), but
    the full streaming decode measures 7.67/7.69/7.68 s with bh=16
    vs 7.63 s with bh=8 — a wash. The isolation delta is dispatch
    latency that pipelines away when the decode's convs run
    back-to-back asynchronously; inside the jitted tower the kernel is
    already overlap-scheduled. Kept opt-in (same interpret-exact
    semantics — the quantization tile partition changes, nothing else)
    rather than default: switching costs a full recompile of every
    decoder conv (~116 s each through the tunneled service) for no
    measured end-to-end win."""
    import os

    if os.environ.get("KANDINSKY5_TPU_CONV_BH16") == "1":
        for cand in (16, 8):
            if h % cand == 0 and _pick_tiles(w, cin, cout, cand, quant)[0]:
                return cand
    return 8


def conv_pallas_supported(x: Array, w: Array, stride) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if x.dtype != jnp.bfloat16 or tuple(stride) != (1, 1, 1):
        return False
    if w.shape[:3] != (3, 3, 3):
        return False
    kt, kh, kw, cin, cout = w.shape
    if cin not in (128, 256, 512) or cout not in (128, 256, 512):
        return False
    b, t, hh, ww, _ = x.shape
    return b == 1 and hh % 8 == 0 and _pick_tiles(ww, cin, cout)[0] > 0


def _kernel(w_ref, bias_ref, scale_ref, shift_ref, wscale_ref, x_hbm,
            o_ref, *scratch, bh: int, bw: int, nh: int, nw: int,
            n_prog: int, n_cb: int, cin: int, cb: int, fuse: bool,
            act: bool, prefix: int, quant: bool):
    if quant:
        in_buf, q_buf, sx_ref, sem = scratch
    else:
        in_buf, sem = scratch
    p = pl.program_id(0)
    c = pl.program_id(1)  # Cout block (one weight slice per iteration)

    def start_dma(prog, slot):
        t = prog // (nh * nw)
        r = prog % (nh * nw)
        h0 = (r // nw) * bh
        w0 = (r % nw) * bw
        # Mosaic requires HBM slice extents 8-aligned along the sublane
        # (W) dim: fetch bw+8 columns (x_pad carries 6 spare columns)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t, 3), pl.ds(h0, bh + 2), pl.ds(w0, bw + 8), :],
            in_buf.at[slot],
            sem.at[slot],
        )

    @pl.when((p == 0) & (c == 0))
    def _warmup():
        start_dma(0, 0).start()

    @pl.when((c == 0) & (p + 1 < n_prog))
    def _prefetch():
        # issue the NEXT spatial tile's copy while all n_cb weight
        # slices of this tile compute (the other scratch slot)
        start_dma(p + 1, (p + 1) % 2).start()

    @pl.when(c == 0)
    def _wait():
        start_dma(p, p % 2).wait()
        if fuse:
            # folded-GroupNorm scale/shift (+ SiLU) applied ONCE per
            # spatial tile, in place — later cout-block iterations
            # reread the transformed tile. Per-time-plane so the fp32
            # temporaries stay at 1/3 of the halo tile: the whole-tile
            # transform OOM'd scoped VMEM at cin=512 (17.77M vs the
            # 16M stack limit, caught by the tiled-decode drive).
            for i in range(3):
                xf = in_buf[p % 2, i].astype(jnp.float32)
                yf = xf * scale_ref[0] + shift_ref[0]
                if act:
                    yf = yf * jax.nn.sigmoid(yf)
                if prefix:
                    # streaming decode: x_pad's first ``prefix`` planes
                    # are the carried history — ALREADY normalized +
                    # activated by the previous chunk — so they pass
                    # through untransformed (plane abs index = t + i)
                    tt = p // (nh * nw)
                    yf = jnp.where(tt + i >= prefix, yf, xf)
                in_buf[p % 2, i] = yf.astype(in_buf.dtype)
        if quant:
            # symmetric per-halo-tile activation scale: one s8 copy,
            # quantized ONCE per spatial tile and reused by all 27 taps
            # x n_cb weight slices. Per-plane passes keep the fp32
            # temporaries at 1/3 tile (same rule as the fuse transform).
            m = jnp.float32(0.0)
            for i in range(3):
                # reduce in f32: Mosaic can't scalarize a bf16 reduction
                m = jnp.maximum(m, jnp.max(jnp.abs(
                    in_buf[p % 2, i].astype(jnp.float32))))
            s = jnp.maximum(m, 1e-8) / 127.0
            sx_ref[p % 2, 0] = s
            inv = 1.0 / s
            for i in range(3):
                xf = in_buf[p % 2, i].astype(jnp.float32) * inv
                q_buf[p % 2, i] = jnp.round(xf).astype(jnp.int8)

    if quant:
        tile = q_buf[p % 2]
        acc32 = jnp.zeros((bh * bw, cb), jnp.int32)
        # s32 accumulation is exact and overflow-free: 27 taps x
        # cin(<=512) x 127^2 = 2.23e8 < 2^31
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    a = tile[dt, dh:dh + bh, dw:dw + bw, :].reshape(
                        bh * bw, cin)
                    acc32 += jax.lax.dot_general(
                        a, w_ref[dt * 9 + dh * 3 + dw],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
        acc = acc32.astype(jnp.float32) * (sx_ref[p % 2, 0]
                                           * wscale_ref[0])
    else:
        tile = in_buf[p % 2]
        acc = jnp.zeros((bh * bw, cb), jnp.float32)
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    a = tile[dt, dh:dh + bh, dw:dw + bw, :].reshape(
                        bh * bw, cin)
                    acc += jax.lax.dot_general(
                        a, w_ref[dt * 9 + dh * 3 + dw],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
    acc += bias_ref[0]
    o_ref[0] = acc.reshape(bh, bw, cb).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "act", "prefix",
                                             "quant", "interpret"))
def _conv_fused(x_pad, w27, bias, scale, shift, bh=8, act=True, prefix=0,
                quant=False, interpret=False):
    """x_pad: (T+2, H+2, W+2, Cin) raw (pre-normalization) input,
    replicate-padded. w27: (27, Cin, Cout). scale/shift: (Cin,) folded
    GroupNorm affine, or None for a plain conv. ``quant``: W8A8 — the
    weight quantizes per-Cout-channel symmetric int8 here (one tiny XLA
    pass), the activation per-halo-tile inside the kernel; QK^T-style
    s8 x s8 -> s32 matmuls run at the MXU's 2x int8 rate.
    Returns (T, H, W, Cout)."""
    tp, hp, wp, cin = x_pad.shape
    t, h, w = tp - 2, hp - 2, wp - 8
    cout = w27.shape[-1]
    bw, cb = _pick_tiles(w, cin, cout, bh, quant=quant)
    n_cb = cout // cb
    nh, nw = h // bh, w // bw
    n_prog = t * nh * nw
    fuse = scale is not None
    if not fuse:
        scale = jnp.ones((cin,), jnp.float32)
        shift = jnp.zeros((cin,), jnp.float32)

    if quant:
        wf = w27.astype(jnp.float32)
        wscale = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1)),
                             1e-8) / 127.0                      # (Cout,)
        w_in = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    else:
        wscale = jnp.ones((cout,), jnp.float32)
        w_in = w27.astype(x_pad.dtype)

    kernel = functools.partial(
        _kernel, bh=bh, bw=bw, nh=nh, nw=nw, n_prog=n_prog, n_cb=n_cb,
        cin=cin, cb=cb, fuse=fuse, act=act, prefix=prefix, quant=quant)
    grid = (n_prog, n_cb)

    def out_map(p, c):
        tt = p // (nh * nw)
        r = p % (nh * nw)
        return (tt, r // nw, r % nw, c)

    scratch = [pltpu.VMEM((2, 3, bh + 2, bw + 8, cin), x_pad.dtype)]
    if quant:
        scratch += [pltpu.VMEM((2, 3, bh + 2, bw + 8, cin), jnp.int8),
                    pltpu.SMEM((2, 1), jnp.float32)]
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((27, cin, cb), lambda p, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda p, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda p, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, cb), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, cout), x_pad.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * h * w * cin * cout * 27,
            bytes_accessed=2 * (x_pad.size + t * h * w * cout),
            transcendentals=x_pad.size if (fuse and act) else 0),
        interpret=interpret,
    )(w_in, bias.astype(jnp.float32)[None],
      scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None],
      wscale.astype(jnp.float32)[None], x_pad)


def causal_conv3d_fused(p, x: Array, scale=None, shift=None, act=False,
                        bh: Optional[int] = None, time_padded: bool = False,
                        prefix_planes: int = 0, quant: bool = False,
                        interpret: bool = False) -> Array:
    """3x3x3 time-causal conv with optional fused per-channel
    scale/shift (folded GroupNorm) and SiLU on the input.

    x: (1, T, H, W, Cin). p: {"weight": (3,3,3,Cin,Cout), "bias": (Cout,)}.
    ``time_padded``: the input already carries the 2 leading causal
    frames (the streaming decoder's carried history,
    models/vae_stream.conv3d_stream) — pad space only.
    ``prefix_planes``: with ``time_padded`` + fusion, that many leading
    time planes are ALREADY transformed (the carried history was
    normalized+activated by the previous chunk) and pass through the
    scale/shift/SiLU untouched. ``quant``: W8A8 int8 matmuls (opt-in,
    KANDINSKY5_TPU_INT8_CONV via models/vae). The caller guarantees
    conv_pallas_supported(...) is True.
    """
    w = p["weight"]
    if bh is None:
        bh = _auto_bh(x.shape[2], x.shape[3], w.shape[3], w.shape[4],
                      quant=quant)
    # 6 extra W columns keep every DMA window's sublane extent 8-aligned
    tpad = 0 if time_padded else 2
    x_pad = jnp.pad(x[0], ((tpad, 0), (1, 1), (1, 7), (0, 0)), mode="edge")
    w27 = w.reshape(27, w.shape[3], w.shape[4])
    y = _conv_fused(x_pad, w27, p["bias"], scale, shift, bh=bh, act=act,
                    prefix=prefix_planes, quant=quant, interpret=interpret)
    return y[None]
