"""Pallas TPU implicit-GEMM 3x3x3 causal conv (OPT-IN; see below).

XLA's conv_general_dilated runs the HunyuanVideo decoder's full-resolution
convs (e.g. (17, 512, 768, 128) -> 128) at ~57 TFLOP/s on v5e; this
kernel reformulates the conv as 27 shifted (rows, Cin) @ (Cin, Cout)
matmuls accumulated in VMEM — the MXU-native decomposition — and fuses
the resnet prologue (GroupNorm's folded per-channel scale/shift + SiLU,
models/vae.py:103-131) into the same pass so the activation tensor makes
one HBM round trip instead of three.

STATUS (measured on v5e, 2026-08): 90.4 TFLOP/s isolated at the
(17,512,768,128->128) shape — 1.6x XLA — but composed into the jitted
decode tile the full VAE decode REGRESSES 17.0 s -> 37.7 s: the Pallas
custom call constrains its operands to the default layout and XLA
re-lays the 1.7 GB activation tensor out around every call. The VAE
therefore keeps the XLA conv path unless KANDINSKY5_TPU_PALLAS_CONV=1.
(A dw-folded im2col variant with K=3*Cin feeds was also tried: Mosaic
compiles it 5x slower and VMEM-OOMs at the production shape.)

Scope (the decoder's measured hot set, models/vae.py:265-282):
  * kernel 3x3x3, stride 1, NDHWC, bf16, Cin/Cout multiples of 128 that
    fit VMEM (128/256). Other shapes keep the XLA path.
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


def _pick_tiles(w: int, cin: int, cout: int, bh: int = 8):
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
    outside the fudge — they are exact, not bookkeeping)."""
    for bw in (256, 192, 128, 96, 64, 48, 32):
        if w % bw:
            continue
        in_bytes = 2 * 3 * (bh + 2) * (bw + 8) * cin * 2
        fuse_tmp = 2 * (bh + 2) * (bw + 8) * cin * 4
        for cb in (cout, 256, 128):
            if cb > cout or cout % cb:
                continue
            w_bytes = 27 * cin * cb * 2
            out_bytes = 2 * bh * bw * cb * 2 + bh * bw * cb * 4
            est = _VMEM_FUDGE * (in_bytes + w_bytes + out_bytes) + fuse_tmp
            if est <= _VMEM_BUDGET:
                return bw, cb
    return 0, 0


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


def _kernel(w_ref, bias_ref, scale_ref, shift_ref, x_hbm, o_ref,
            in_buf, sem, *, bh: int, bw: int, nh: int, nw: int,
            n_prog: int, n_cb: int, cin: int, cb: int, fuse: bool,
            act: bool):
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
                xf = xf * scale_ref[0] + shift_ref[0]
                if act:
                    xf = xf * jax.nn.sigmoid(xf)
                in_buf[p % 2, i] = xf.astype(in_buf.dtype)

    tile = in_buf[p % 2]

    acc = jnp.zeros((bh * bw, cb), jnp.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                a = tile[dt, dh:dh + bh, dw:dw + bw, :].reshape(bh * bw, cin)
                acc += jax.lax.dot_general(
                    a, w_ref[dt * 9 + dh * 3 + dw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    acc += bias_ref[0]
    o_ref[0] = acc.reshape(bh, bw, cb).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "act", "interpret"))
def _conv_fused(x_pad, w27, bias, scale, shift, bh=8, act=True,
                interpret=False):
    """x_pad: (T+2, H+2, W+2, Cin) raw (pre-normalization) input,
    replicate-padded. w27: (27, Cin, Cout). scale/shift: (Cin,) folded
    GroupNorm affine, or None for a plain conv. Returns (T, H, W, Cout).
    """
    tp, hp, wp, cin = x_pad.shape
    t, h, w = tp - 2, hp - 2, wp - 8
    cout = w27.shape[-1]
    bw, cb = _pick_tiles(w, cin, cout, bh)
    n_cb = cout // cb
    nh, nw = h // bh, w // bw
    n_prog = t * nh * nw
    fuse = scale is not None
    if not fuse:
        scale = jnp.ones((cin,), jnp.float32)
        shift = jnp.zeros((cin,), jnp.float32)

    kernel = functools.partial(
        _kernel, bh=bh, bw=bw, nh=nh, nw=nw, n_prog=n_prog, n_cb=n_cb,
        cin=cin, cb=cb, fuse=fuse, act=act)
    grid = (n_prog, n_cb)

    def out_map(p, c):
        tt = p // (nh * nw)
        r = p % (nh * nw)
        return (tt, r // nw, r % nw, c)

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
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, cb), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, cout), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bh + 2, bw + 8, cin), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * h * w * cin * cout * 27,
            bytes_accessed=2 * (x_pad.size + t * h * w * cout),
            transcendentals=x_pad.size if (fuse and act) else 0),
        interpret=interpret,
    )(w27.astype(x_pad.dtype), bias.astype(jnp.float32)[None],
      scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None],
      x_pad)


def causal_conv3d_fused(p, x: Array, scale=None, shift=None, act=False,
                        bh: int = 8, time_padded: bool = False,
                        interpret: bool = False) -> Array:
    """3x3x3 time-causal conv with optional fused per-channel
    scale/shift (folded GroupNorm) and SiLU on the input.

    x: (1, T, H, W, Cin). p: {"weight": (3,3,3,Cin,Cout), "bias": (Cout,)}.
    ``time_padded``: the input already carries the 2 leading causal
    frames (the streaming decoder's carried history,
    models/vae_stream.conv3d_stream) — pad space only. The caller
    guarantees conv_pallas_supported(...) is True.
    """
    w = p["weight"]
    # 6 extra W columns keep every DMA window's sublane extent 8-aligned
    tpad = 0 if time_padded else 2
    x_pad = jnp.pad(x[0], ((tpad, 0), (1, 1), (1, 7), (0, 0)), mode="edge")
    w27 = w.reshape(27, w.shape[3], w.shape[4])
    y = _conv_fused(x_pad, w27, p["bias"], scale, shift, bh=bh, act=act,
                    interpret=interpret)
    return y[None]
