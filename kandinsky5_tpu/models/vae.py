"""HunyuanVideo 3D causal VAE — TPU-native JAX implementation.

Re-design of the vendored diffusers model the reference uses for
latent<->pixel conversion (/root/reference/kandinsky/models/vae.py).
Structure (4x temporal / 8x spatial compression, 16 latent channels,
causal convs with replicate padding, GroupNorm(32)+SiLU resnets,
single-head causal mid-block attention) follows the reference
faithfully; the execution model is TPU-first:

  * channels-last NDHWC layout, convs via lax.conv_general_dilated —
    XLA maps 3D convs onto the MXU;
  * GroupNorm/softmax in fp32, convs in the parameter dtype;
  * tiled decode/encode is host-side orchestration around a jitted
    per-tile network (static tile shapes -> one compile per tile shape),
    with vectorized blend ramps instead of the reference's per-row
    Python loops (vae.py:908-936).

Parameter pytrees are keyed to the HF checkpoint names
(encoder.*, decoder.*, quant_conv, post_quant_conv) so conversion is
mechanical (checkpoint.py:convert_vae_state_dict).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

GROUPNORM_EPS = 1e-6
SCALING_FACTOR = 0.476986  # reference vae.py:732

# Optimal tiling lookup tables (reference-specific addition,
# vae.py:26-107): frame-count -> (tile, stride) in sample frames, and
# spatial size -> (tile, stride) in pixels. These are calibration
# constants, reproduced as data.
OPT_TEMPORAL_TILING = {1: (1, 1), 17: (17, 17)}
OPT_TEMPORAL_TILING.update({
    21: (13, 8), 25: (17, 8), 29: (17, 12), 33: (21, 12), 37: (21, 16),
    41: (17, 12), 45: (21, 12), 49: (17, 8), 53: (21, 16), 57: (21, 12),
    61: (13, 8), 65: (17, 12), 69: (21, 16), 73: (17, 8), 77: (17, 12),
    81: (21, 12), 85: (21, 16), 89: (17, 12), 93: (21, 12), 97: (17, 8),
    101: (21, 16), 105: (21, 12), 109: (13, 8), 113: (17, 12), 117: (21, 16),
    121: (17, 8), 125: (17, 12), 129: (21, 12), 133: (21, 16), 137: (17, 12),
    141: (21, 12), 145: (17, 8), 149: (21, 16), 153: (21, 12), 157: (13, 8),
    161: (17, 12), 165: (21, 16), 169: (17, 8), 173: (17, 12), 177: (21, 12),
    181: (21, 16), 185: (17, 12), 189: (21, 12), 193: (17, 8), 197: (21, 16),
    201: (21, 12), 205: (13, 8), 209: (17, 12), 213: (21, 16), 217: (17, 8),
    221: (17, 12), 225: (21, 12), 229: (21, 16), 233: (17, 12), 237: (21, 12),
    241: (17, 8),
})

OPT_SPATIAL_TILING = {
    160: (160, 160), 192: (192, 192), 224: (224, 224), 256: (256, 256),
    288: (288, 288), 320: (320, 320), 352: (352, 352), 384: (384, 384),
    448: (448, 448), 512: (288, 224), 576: (320, 256), 640: (352, 288),
    704: (384, 320), 768: (416, 352), 896: (480, 416), 1024: (544, 480),
    1152: (608, 544), 1280: (672, 608), 1408: (736, 672),
}


# ---------------------------------------------------------------------------
# Primitive layers (functional, NDHWC)
# ---------------------------------------------------------------------------

def causal_conv3d(p, x: Array, stride=(1, 1, 1)) -> Array:
    """3D conv with time-causal replicate padding (reference
    HunyuanVideoCausalConv3d, vae.py:125-163: F.pad replicate with
    (kT-1, 0) on time and k//2 both sides on space, then VALID conv).

    x: (B, T, H, W, C); weight: (kT, kH, kW, Cin, Cout).

    Dispatch: 1x1x1 kernels (resnet shortcuts) run as a pointwise dot —
    layout-neutral, so they never pull XLA's conv layouts into an
    otherwise-Pallas tower. 3x3x3 kernels at supported channel widths
    route through the Pallas implicit-GEMM kernel when the all-Pallas
    decode path is enabled (see _conv_pallas_on): the r4 chain
    experiment measured Pallas-only at 101.5 TFLOP/s vs XLA-only 68.8
    and MIXED 53.5 at the full-res shape — mixing is what regressed
    round 3's attempt, so adoption is all-or-nothing per shape class.
    """
    w = p["weight"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if (kt, kh, kw) == (1, 1, 1):
        return conv1x1(p, x)
    if stride == (1, 1, 1) and _conv_pallas_on(p, x):
        from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

        return causal_conv3d_fused(p, x, quant=_int8_conv_on())
    x = jnp.pad(
        x,
        ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        mode="edge",
    )
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=tuple(stride),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv1x1(p, x: Array) -> Array:
    """Pointwise 3D conv (quant/post_quant conv, vae.py:768-773)."""
    w = p["weight"].reshape(p["weight"].shape[-2], p["weight"].shape[-1])
    y = jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _gn_fold(p, x: Array, groups: int = 32,
             eps: float = GROUPNORM_EPS) -> Tuple[Array, Array]:
    """GroupNorm statistics folded into ONE per-channel scale+shift.

    Stats are computed channel-major: one lane-aligned reduction over all
    voxels to per-channel sums, then the (tiny) per-group fold — a single
    fused pass over the data, ~6x faster than reducing the (groups, c/g)
    reshape directly (the c/g=4..16 lane split defeats XLA's layout).
    Returns ((B, C) scale, (B, C) shift) in fp32.
    """
    b, t, h, w, c = x.shape
    n = t * h * w
    xf = x.astype(jnp.float32).reshape(b, n, c)
    s1 = jnp.sum(xf, axis=1)                 # (B, C)
    s2 = jnp.sum(jnp.square(xf), axis=1)     # (B, C)
    cg = c // groups
    g1 = s1.reshape(b, groups, cg).sum(-1, keepdims=True)  # (B, G, 1)
    g2 = s2.reshape(b, groups, cg).sum(-1, keepdims=True)
    cnt = float(n * cg)
    mean = g1 / cnt
    # E[x^2]-mean^2 can land slightly negative from fp32 accumulation
    # error on near-constant groups with large mean; clamp before rsqrt
    var = jnp.maximum(g2 / cnt - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    wgt = p["weight"].astype(jnp.float32).reshape(groups, cg)
    bias = p["bias"].astype(jnp.float32).reshape(groups, cg)
    scale_c = (rstd * wgt).reshape(b, c)
    shift_c = (bias - mean * rstd * wgt).reshape(b, c)
    return scale_c, shift_c


def group_norm(p, x: Array, groups: int = 32, eps: float = GROUPNORM_EPS) -> Array:
    """GroupNorm over (T, H, W, C/groups) in fp32, NDHWC (see _gn_fold)."""
    b, t, h, w, c = x.shape
    scale_c, shift_c = _gn_fold(p, x, groups, eps)
    y = (x.astype(jnp.float32).reshape(b, -1, c)
         * scale_c[:, None] + shift_c[:, None])
    return y.reshape(b, t, h, w, c).astype(x.dtype)


def _conv_pallas_on(p, x: Array) -> bool:
    """All-Pallas decode-tower policy.

    Round 3 ran the Pallas conv only at the Cout=128 full-res shapes
    and REGRESSED the decode 17 -> 37.7 s: XLA re-lays activations out
    around every Pallas<->XLA-conv boundary. The round-4 chain
    experiment on-chip isolated the cause — back-to-back Pallas convs
    sustain 101.5 TFLOP/s, back-to-back XLA 68.8, a MIXED chain 53.5 —
    so the kernel now covers every decoder 3x3x3 (C in {128,256,512}
    via Cout blocking) and adoption is per whole tower, not per conv.

    DEFAULT ON on TPU (conv_pallas_supported refuses other backends):
    measured on-chip at the production 5s shape, the all-Pallas stream
    decode runs 7.5 s vs XLA's 9.5 s and matches it at 48.0 dB PSNR
    (bf16 reassociation noise, not an accuracy trade — the interpret
    test is exact vs the XLA conv in fp32 at Cin=128).
    KANDINSKY5_TPU_PALLAS_CONV=0 opts out (XLA everywhere).
    """
    import os

    from kandinsky5_tpu.ops.conv_pallas import conv_pallas_supported

    if os.environ.get("KANDINSKY5_TPU_PALLAS_CONV") == "0":
        return False
    return conv_pallas_supported(x, p["weight"], (1, 1, 1))


def _fuse_gn_on(default: bool) -> bool:
    """Whether GN+SiLU folds into the Pallas conv kernel. The default
    is MODE-DEPENDENT, from an on-chip ABAB at the 5s production shape:

      * tiled/plain decode (this module): fused 15.2 s vs unfused
        31.0 s -> fuse. With 17-frame tiles the unfused graph leaves
        big XLA GN/SiLU ops between Pallas calls and XLA re-lays the
        activations out around every custom call (the r3 MIXED-chain
        failure mode, resurfacing via elementwise ops instead of convs).
      * streaming decode (vae_stream): unfused 7.6/7.7 s vs fused
        8.1/8.1 s -> don't fuse. The small state-carry chunks don't
        trigger the relayout, so what remains is the fused transform's
        cost: per-tile VPU work serialized ahead of the 27 MXU matmuls
        (~4 us incl. the 1.29x halo re-transform) vs the ~1.2 us HBM
        round trip it saves — sigmoid on the VPU is dearer than
        re-reading bf16 activations.

    KANDINSKY5_TPU_PALLAS_FUSE=0/1 overrides both (the A/B switch;
    fused==unfused to 2e-4, tests/test_pallas_interpret.py)."""
    import os

    env = os.environ.get("KANDINSKY5_TPU_PALLAS_FUSE")
    if env in ("0", "1"):
        return env == "1"
    return default


def _int8_conv_on() -> bool:
    """OPT-IN W8A8 int8 matmuls inside the Pallas decode tower
    (KANDINSKY5_TPU_INT8_CONV=1): s8 x s8 -> s32 runs at the MXU's 2x
    int8 rate. Unlike the round-3 negative (XLA's int8 conv lowering,
    only 1.24x isolated), this quantizes inside our own implicit-GEMM
    kernel — one per-halo-tile activation scale amortized over 27 taps
    x all Cout blocks. Accuracy is an explicit trade (see DEVIATIONS),
    measured by the bench's decode-PSNR probes."""
    import os

    return os.environ.get("KANDINSKY5_TPU_INT8_CONV") == "1"


def _gn_silu_conv(p_norm, p_conv, x: Array) -> Array:
    """GN -> SiLU -> causal conv, fused into the Pallas conv kernel when
    supported (one HBM round trip for the activation instead of three)."""
    if _conv_pallas_on(p_conv, x) and _fuse_gn_on(default=True):
        from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

        scale_c, shift_c = _gn_fold(p_norm, x)
        return causal_conv3d_fused(p_conv, x, scale=scale_c[0],
                                   shift=shift_c[0], act=True,
                                   quant=_int8_conv_on())
    h = group_norm(p_norm, x)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return causal_conv3d(p_conv, h)


def resnet_block(p, x: Array) -> Array:
    """GN -> SiLU -> conv -> GN -> SiLU -> conv + (1x1) shortcut
    (reference HunyuanVideoResnetBlockCausal3D, vae.py:230-275)."""
    residual = x
    h = _gn_silu_conv(p["norm1"], p["conv1"], x)
    h = _gn_silu_conv(p["norm2"], p["conv2"], h)
    if "conv_shortcut" in p:
        residual = causal_conv3d(p["conv_shortcut"], residual)
    return h + residual


def mid_attention(p, x: Array) -> Array:
    """Single-head causal-frame attention over all voxels (reference
    HunyuanVideoMidBlock3D + diffusers Attention, vae.py:278-362,110-122):
    GroupNorm -> qkv -> softmax(fp32) with frame-causal mask -> out proj,
    residual add. x: (B, T, H, W, C)."""
    b, t, h, w, c = x.shape
    s = h * w
    residual = x
    y = group_norm(p["group_norm"], x)
    tokens = y.reshape(b, t * s, c)
    q = jnp.dot(tokens, p["to_q"]["weight"], preferred_element_type=jnp.float32)
    q = q + p["to_q"]["bias"].astype(jnp.float32)
    k = jnp.dot(tokens, p["to_k"]["weight"], preferred_element_type=jnp.float32)
    k = k + p["to_k"]["bias"].astype(jnp.float32)
    v = jnp.dot(tokens, p["to_v"]["weight"], preferred_element_type=jnp.float32)
    v = v + p["to_v"]["bias"].astype(jnp.float32)

    # frame-causal mask: voxel in frame i attends frames <= i
    frame_ids = jnp.broadcast_to(jnp.arange(t).repeat(s)[None], (b, t * s))
    from kandinsky5_tpu.ops.flash_pallas import flash_attention, flash_supported

    qh = q.astype(x.dtype)[:, :, None, :]  # single head (B, L, 1, C)
    if flash_supported(qh, qh) and (t * s) >= 2048:
        # flash path: O(S) memory; the dense path would materialize a
        # (T·H·W)^2 fp32 score matrix (3.8 GB at the 5s decode tile)
        kh = k.astype(x.dtype)[:, :, None, :]
        vh = v.astype(x.dtype)[:, :, None, :]
        out = flash_attention(qh, kh, vh, q_ids=frame_ids, kv_ids=frame_ids,
                              fixed_shift=False)[:, :, 0, :]
    else:
        scale = 1.0 / math.sqrt(c)
        scores = jnp.einsum("bld,bmd->blm", q, k,
                            preferred_element_type=jnp.float32) * scale
        allowed = frame_ids[0][:, None] >= frame_ids[0][None, :]
        scores = jnp.where(allowed[None], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("blm,bmd->bld", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    out = jnp.dot(out, p["to_out"]["0"]["weight"],
                  preferred_element_type=jnp.float32)
    out = out + p["to_out"]["0"]["bias"].astype(jnp.float32)
    out = out.reshape(b, t, h, w, c).astype(x.dtype)
    return out + residual


def upsample(p, x: Array, factor: Tuple[int, int, int]) -> Array:
    """Nearest-neighbour upsample; the first frame upsamples spatially
    only, preserving causality (reference HunyuanVideoUpsampleCausal3D,
    vae.py:166-205). Then a causal conv."""
    ft, fh, fw = factor
    first, rest = x[:, :1], x[:, 1:]
    if fh > 1:
        first = jnp.repeat(jnp.repeat(first, fh, axis=2), fw, axis=3)
    if rest.shape[1] > 0:
        if ft > 1:
            rest = jnp.repeat(rest, ft, axis=1)
        if fh > 1:
            rest = jnp.repeat(jnp.repeat(rest, fh, axis=2), fw, axis=3)
        x = jnp.concatenate([first, rest], axis=1)
    else:
        x = first
    return causal_conv3d(p["conv"], x)


# ---------------------------------------------------------------------------
# Encoder / decoder towers
# ---------------------------------------------------------------------------

BLOCK_OUT_CHANNELS = (128, 256, 512, 512)
LAYERS_PER_BLOCK = 2


def _down_plan():
    """(add_spatial, add_time) per down block for 4x temporal / 8x
    spatial compression (reference vae.py:512-538)."""
    n = len(BLOCK_OUT_CHANNELS)
    n_space, n_time = 3, 2
    plan = []
    for i in range(n):
        add_space = i < n_space
        add_time = i >= (n - 1 - n_time) and i != n - 1
        plan.append((add_space, add_time))
    return plan


def _up_plan():
    """(add_spatial, add_time) per up block (reference vae.py:634-659)."""
    n = len(BLOCK_OUT_CHANNELS)
    n_space, n_time = 3, 2
    plan = []
    for i in range(n):
        add_space = i < n_space
        add_time = i >= (n - 1 - n_time) and i != n - 1
        plan.append((add_space, add_time))
    return plan


def encoder_forward(p, x: Array) -> Array:
    """(B, T, H, W, 3) -> (B, T', H/8, W/8, 32) moments
    (reference HunyuanVideoEncoder3D, vae.py:478-586)."""
    h = causal_conv3d(p["conv_in"], x)
    for i, (add_s, add_t) in enumerate(_down_plan()):
        blk = p["down_blocks"][str(i)]
        for j in range(LAYERS_PER_BLOCK):
            h = resnet_block(blk["resnets"][str(j)], h)
        if "downsamplers" in blk:
            stride = ((2 if add_t else 1), (2 if add_s else 1), (2 if add_s else 1))
            h = causal_conv3d(blk["downsamplers"]["0"]["conv"], h, stride=stride)
    mid = p["mid_block"]
    h = resnet_block(mid["resnets"]["0"], h)
    h = mid_attention(mid["attentions"]["0"], h)
    h = resnet_block(mid["resnets"]["1"], h)
    h = group_norm(p["conv_norm_out"], h)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return causal_conv3d(p["conv_out"], h)


def decoder_forward(p, z: Array) -> Array:
    """(B, T', H', W', 16) -> (B, T, 8H', 8W', 3)
    (reference HunyuanVideoDecoder3D, vae.py:589-696)."""
    h = causal_conv3d(p["conv_in"], z)
    mid = p["mid_block"]
    h = resnet_block(mid["resnets"]["0"], h)
    h = mid_attention(mid["attentions"]["0"], h)
    h = resnet_block(mid["resnets"]["1"], h)
    for i, (add_s, add_t) in enumerate(_up_plan()):
        blk = p["up_blocks"][str(i)]
        for j in range(LAYERS_PER_BLOCK + 1):
            h = resnet_block(blk["resnets"][str(j)], h)
        if "upsamplers" in blk:
            factor = ((2 if add_t else 1), (2 if add_s else 1), (2 if add_s else 1))
            h = upsample(blk["upsamplers"]["0"], h, factor)
    h = group_norm(p["conv_norm_out"], h)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return causal_conv3d(p["conv_out"], h)


# ---------------------------------------------------------------------------
# Tiled orchestration (reference vae.py:795-1204)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def _decode_tile(params, z):
    z = conv1x1(params["post_quant_conv"], z)
    return decoder_forward(params["decoder"], z)


@functools.partial(jax.jit, static_argnames=())
def _encode_tile(params, x):
    h = encoder_forward(params["encoder"], x)
    return conv1x1(params["quant_conv"], h)


def _blend(a: Array, b: Array, extent: int, axis: int) -> Array:
    """Linear cross-fade of the last `extent` slices of a into the first
    `extent` slices of b along `axis` (vectorized form of reference
    blend_t/h/v, vae.py:908-936)."""
    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent == 0:
        return b
    ramp_shape = [1] * b.ndim
    ramp_shape[axis] = extent
    ramp = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(ramp_shape)
    a_tail = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis], axis=axis)
    b_head = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
    blended = (a_tail.astype(jnp.float32) * (1 - ramp)
               + b_head.astype(jnp.float32) * ramp).astype(b.dtype)
    b_rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
    return jnp.concatenate([blended, b_rest], axis=axis)


class HunyuanVideoVAE:
    """Tiled 3D causal VAE. Array layout is (B, T, H, W, C) throughout
    (the pipeline converts to/from the reference's NCTHW at the edges).
    """

    spatial_compression = 8
    temporal_compression = 4
    scaling_factor = SCALING_FACTOR

    def __init__(self, params, dtype=jnp.bfloat16, mesh=None):
        self.params = params
        self.dtype = dtype
        # optional device mesh: temporal tiles are decoded as one
        # dp-sharded batch (they are independent until blending)
        self.mesh = mesh
        # tiling state, set per call from the OPT tables (reference
        # apply_tiling, vae.py:1230-1243)
        self.tile_sample_min_num_frames = 16
        self.tile_sample_stride_num_frames = 12
        self.tile_sample_min_height = 256
        self.tile_sample_min_width = 256
        self.tile_sample_stride_height = 192
        self.tile_sample_stride_width = 192

    def default_decode_mode(self) -> str:
        """Decode-mode policy shared by pipeline.decode_latents and the
        ComfyUI decode node: KANDINSKY5_TPU_VAE_DECODE overrides;
        otherwise streaming on a single device (models/vae_stream.py),
        faithful dp-tiled on a mesh (independent tiles batch across
        chips; streaming is serial in time)."""
        import os

        mode = os.environ.get("KANDINSKY5_TPU_VAE_DECODE")
        if mode in ("tiled", "stream"):
            return mode
        return "tiled" if self.mesh is not None else "stream"

    # -- tiling selection (reference get_enc/dec_optimal_tiling,
    #    vae.py:1245-1273)
    def _optimal_tiling(self, num_frames, height, width):
        if math.sqrt(height * width) < 450 and num_frames <= 97:
            ft, fs = num_frames, num_frames
        else:
            ft, fs = OPT_TEMPORAL_TILING[num_frames]
        if math.sqrt(height * width) > 900:
            ht, hs = OPT_SPATIAL_TILING[height]
            wt, ws = OPT_SPATIAL_TILING[width]
        else:
            ht, hs, wt, ws = height, height, width, width
        return (ft, ht, wt), (fs, hs, ws)

    def _apply_tiling(self, tile, stride):
        ft, ht, wt = tile
        fs, hs, ws = stride
        self.tile_sample_min_num_frames = ft - 1
        self.tile_sample_stride_num_frames = fs
        self.tile_sample_min_height = ht
        self.tile_sample_min_width = wt
        self.tile_sample_stride_height = hs
        self.tile_sample_stride_width = ws

    # ------------------------------------------------------------------
    # Decode
    # ------------------------------------------------------------------

    def decode(self, z: Array, opt_tiling: bool = True,
               mode: str = "tiled") -> Array:
        """(B, T', H', W', 16) latents -> (B, T, H, W, 3) in [-1, 1].

        ``mode``: "tiled" reproduces the reference's overlap-tile decode
        bit-for-bit (vae.py:795-1204); "stream" decodes disjoint chunks
        with carried causal state (models/vae_stream.py) — no overlap
        recompute (2.26x fewer conv FLOPs at the 5s shape) and no blend
        seams, at the cost of per-chunk (instead of per-tile) GroupNorm
        statistics. Streaming requires the spatially-untiled regime
        (every production config's resolution); it falls back to tiled
        when spatial tiling would kick in.
        """
        z = z.astype(self.dtype)
        b, tf, hl, wl, _ = z.shape
        if opt_tiling:
            sample_frames = 4 * (tf - 1) + 1
            tile, stride = self._optimal_tiling(sample_frames, 8 * hl, 8 * wl)
            self._apply_tiling(tile, stride)

        if mode == "stream":
            needs_spatial = (
                wl > self.tile_sample_stride_width // self.spatial_compression
                or hl > self.tile_sample_min_height // self.spatial_compression)
            if not needs_spatial:
                from kandinsky5_tpu.models.vae_stream import streaming_decode

                return streaming_decode(self.params, z)

        tile_lat_f = self.tile_sample_min_num_frames // self.temporal_compression
        if tf > tile_lat_f + 1:
            return self._temporal_tiled_decode(z)
        return self._spatial_decode(z)

    def _spatial_decode(self, z: Array) -> Array:
        b, tf, hl, wl, _ = z.shape
        tile_lat_h = self.tile_sample_min_height // self.spatial_compression
        # NOTE: the reference compares width against
        # tile_sample_stride_width//8 here (vae.py:854-856) — an apparent
        # quirk we reproduce for parity.
        tile_lat_w = self.tile_sample_stride_width // self.spatial_compression
        if wl > tile_lat_w or hl > tile_lat_h:
            return self._spatial_tiled_decode(z)
        return _decode_tile(self.params, z)

    def _spatial_tiled_decode(self, z: Array) -> Array:
        """Overlap-tile over H/W with linear blending (reference
        tiled_decode, vae.py:1012-1094)."""
        sc = self.spatial_compression
        b, tf, hl, wl, _ = z.shape
        sample_h, sample_w = hl * sc, wl * sc
        t_lat_h = self.tile_sample_min_height // sc
        t_lat_w = self.tile_sample_min_width // sc
        s_lat_h = self.tile_sample_stride_height // sc
        s_lat_w = self.tile_sample_stride_width // sc
        blend_h = self.tile_sample_min_height - self.tile_sample_stride_height
        blend_w = self.tile_sample_min_width - self.tile_sample_stride_width

        i_starts = list(range(0, hl - t_lat_h + 1, s_lat_h))
        j_starts = list(range(0, wl - t_lat_w + 1, s_lat_w))
        coords = [(i, j) for i in i_starts for j in j_starts]
        if self.mesh is not None and len(coords) > 1:
            # every spatial tile is exactly (t_lat_h, t_lat_w): batch
            # them all into one dp-sharded decode (same pattern as the
            # temporal tiles below — VERDICT r2 item 2c)
            from jax.sharding import NamedSharding, PartitionSpec as P

            tiles = jnp.concatenate(
                [z[:, :, i:i + t_lat_h, j:j + t_lat_w, :]
                 for i, j in coords], axis=0)
            n_dev = self.mesh.shape.get("dp", 1)
            pad = (-tiles.shape[0]) % n_dev
            if pad:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((pad, *tiles.shape[1:]), tiles.dtype)],
                    axis=0)
            tiles = jax.device_put(tiles, NamedSharding(self.mesh, P("dp")))
            decoded_all = _decode_tile(self.params, tiles)
            # one explicit gather off the mesh: the blend loop below is
            # cheap + sequential, and running it eagerly on slices of a
            # dp-sharded array would issue dozens of tiny multi-device
            # ops (observed to wedge XLA:CPU's collective rendezvous in
            # long-lived processes; on TPU they'd be pointless ICI hops)
            decoded_all = jax.device_get(decoded_all)
            rows = []
            idx = 0
            for _ in i_starts:
                row = []
                for _ in j_starts:
                    row.append(decoded_all[idx * b:(idx + 1) * b])
                    idx += 1
                rows.append(row)
        else:
            rows = []
            for i in i_starts:
                row = []
                for j in j_starts:
                    tile = z[:, :, i:i + t_lat_h, j:j + t_lat_w, :]
                    row.append(_decode_tile(self.params, tile))
                rows.append(row)

        result_rows = []
        for i, row in enumerate(rows):
            result_row = []
            for j, tile in enumerate(row):
                # the reference blend mutates tiles in place
                # (vae.py:908-936), so each blend chains off the already-
                # blended neighbor — replicate by writing back
                if i > 0:
                    tile = _blend(rows[i - 1][j], tile, blend_h, axis=2)
                if j > 0:
                    tile = _blend(rows[i][j - 1], tile, blend_w, axis=3)
                rows[i][j] = tile
                h_lim = (self.tile_sample_min_height if i == len(rows) - 1
                         else self.tile_sample_stride_height)
                w_lim = (self.tile_sample_min_width if j == len(row) - 1
                         else self.tile_sample_stride_width)
                result_row.append(tile[:, :, :h_lim, :w_lim, :])
            result_rows.append(jnp.concatenate(result_row, axis=3))
        out = jnp.concatenate(result_rows, axis=2)
        return out[:, :, :sample_h, :sample_w, :]

    def _temporal_tiled_decode(self, z: Array) -> Array:
        """Chunk over latent time with one-frame overlap re-decode and
        linear blending (reference _temporal_tiled_decode,
        vae.py:1144-1204)."""
        b, tf, hl, wl, _ = z.shape
        num_sample_frames = (tf - 1) * self.temporal_compression + 1
        t_lat_f = self.tile_sample_min_num_frames // self.temporal_compression
        s_lat_f = self.tile_sample_stride_num_frames // self.temporal_compression
        blend_f = (self.tile_sample_min_num_frames
                   - self.tile_sample_stride_num_frames)

        starts = list(range(0, tf - t_lat_f + 1, s_lat_f))
        full = [i for i in starts if i + t_lat_f + 1 <= tf]
        if self.mesh is not None and len(full) > 1:
            # batch the equally-shaped tiles and decode them in one
            # dp-sharded call — each device takes a subset of tiles.
            # Ragged boundary tiles (shorter time extent) decode
            # separately: GroupNorm is not time-causal, so padding them
            # would change the result.
            from jax.sharding import NamedSharding, PartitionSpec as P

            tiles = jnp.concatenate(
                [z[:, i:i + t_lat_f + 1] for i in full], axis=0)
            n_dev = self.mesh.shape.get("dp", 1)
            pad = (-tiles.shape[0]) % n_dev
            if pad:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((pad, *tiles.shape[1:]), tiles.dtype)],
                    axis=0)
            tiles = jax.device_put(tiles, NamedSharding(self.mesh, P("dp")))
            decoded_all = _decode_tile(self.params, tiles)
            # gather once before the sequential blend (see
            # _spatial_tiled_decode's mesh branch for why)
            decoded_all = jax.device_get(decoded_all)
            decoded_by_start = {
                i: decoded_all[j * b:(j + 1) * b] for j, i in enumerate(full)}
            row = []
            for i in starts:
                if i in decoded_by_start:
                    d = decoded_by_start[i]
                else:
                    d = self._spatial_decode(z[:, i:i + t_lat_f + 1])
                row.append(d[:, 1:] if i > 0 else d)
        else:
            row = []
            for i in starts:
                tile = z[:, i:i + t_lat_f + 1]
                decoded = self._spatial_decode(tile)
                if i > 0:
                    decoded = decoded[:, 1:]
                row.append(decoded)

        result = []
        for i, tile in enumerate(row):
            if i > 0:
                tile = _blend(row[i - 1], tile, blend_f, axis=1)
                row[i] = tile  # chain off blended tiles (in-place reference)
                t_lim = (self.tile_sample_min_num_frames if i == len(row) - 1
                         else self.tile_sample_stride_num_frames)
                result.append(tile[:, :t_lim])
            else:
                result.append(tile[:, :self.tile_sample_stride_num_frames + 1])
        out = jnp.concatenate(result, axis=1)
        return out[:, :num_sample_frames]

    # ------------------------------------------------------------------
    # Encode
    # ------------------------------------------------------------------

    def encode_moments(self, x: Array, opt_tiling: bool = True) -> Array:
        """(B, T, H, W, 3) -> (B, T', H', W', 32) mean||logvar moments."""
        x = x.astype(self.dtype)
        b, t, hh, ww, _ = x.shape
        if opt_tiling:
            tile, stride = self._optimal_tiling(t, hh, ww)
            self._apply_tiling(tile, stride)

        if t > self.tile_sample_min_num_frames + 1:
            return self._temporal_tiled_encode(x)
        return self._spatial_encode(x)

    def encode(self, x: Array, seed: Optional[int] = None,
               opt_tiling: bool = True) -> Array:
        """Encode to latents: posterior mode, or a sample when a seed is
        given (reference DiagonalGaussianDistribution semantics)."""
        moments = self.encode_moments(x, opt_tiling=opt_tiling)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if seed is None:
            return mean
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        noise = jax.random.normal(jax.random.PRNGKey(seed), mean.shape,
                                  jnp.float32)
        return (mean.astype(jnp.float32) + std * noise).astype(mean.dtype)

    def _spatial_encode(self, x: Array) -> Array:
        b, t, hh, ww, _ = x.shape
        if (ww > self.tile_sample_min_width or hh > self.tile_sample_min_height):
            return self._spatial_tiled_encode(x)
        return _encode_tile(self.params, x)

    def _spatial_tiled_encode(self, x: Array) -> Array:
        """Reference tiled_encode (vae.py:938-1010)."""
        sc = self.spatial_compression
        b, t, hh, ww, _ = x.shape
        latent_h, latent_w = hh // sc, ww // sc
        t_lat_h = self.tile_sample_min_height // sc
        t_lat_w = self.tile_sample_min_width // sc
        s_lat_h = self.tile_sample_stride_height // sc
        s_lat_w = self.tile_sample_stride_width // sc
        blend_h = t_lat_h - s_lat_h
        blend_w = t_lat_w - s_lat_w

        rows = []
        for i in range(0, hh - self.tile_sample_min_height + 1,
                       self.tile_sample_stride_height):
            row = []
            for j in range(0, ww - self.tile_sample_min_width + 1,
                           self.tile_sample_stride_width):
                tile = x[:, :, i:i + self.tile_sample_min_height,
                         j:j + self.tile_sample_min_width, :]
                row.append(_encode_tile(self.params, tile))
            rows.append(row)

        result_rows = []
        for i, row in enumerate(rows):
            result_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = _blend(rows[i - 1][j], tile, blend_h, axis=2)
                if j > 0:
                    tile = _blend(rows[i][j - 1], tile, blend_w, axis=3)
                rows[i][j] = tile  # chain off blended tiles
                h_lim = t_lat_h if i == len(rows) - 1 else s_lat_h
                w_lim = t_lat_w if j == len(row) - 1 else s_lat_w
                result_row.append(tile[:, :, :h_lim, :w_lim, :])
            result_rows.append(jnp.concatenate(result_row, axis=3))
        out = jnp.concatenate(result_rows, axis=2)
        return out[:, :, :latent_h, :latent_w, :]

    def _temporal_tiled_encode(self, x: Array) -> Array:
        """Reference _temporal_tiled_encode (vae.py:1096-1142)."""
        b, t, hh, ww, _ = x.shape
        latent_f = (t - 1) // self.temporal_compression + 1
        t_lat_f = self.tile_sample_min_num_frames // self.temporal_compression
        s_lat_f = self.tile_sample_stride_num_frames // self.temporal_compression
        blend_f = t_lat_f - s_lat_f

        row = []
        for i in range(0, t - self.tile_sample_min_num_frames + 1,
                       self.tile_sample_stride_num_frames):
            tile = x[:, i:i + self.tile_sample_min_num_frames + 1]
            enc = self._spatial_encode(tile)
            if i > 0:
                enc = enc[:, 1:]
            row.append(enc)

        result = []
        for i, tile in enumerate(row):
            if i > 0:
                tile = _blend(row[i - 1], tile, blend_f, axis=1)
                row[i] = tile  # chain off blended tiles
                t_lim = t_lat_f if i == len(row) - 1 else s_lat_f
                result.append(tile[:, :t_lim])
            else:
                result.append(tile[:, :s_lat_f + 1])
        out = jnp.concatenate(result, axis=1)
        return out[:, :latent_f]


# ---------------------------------------------------------------------------
# Parameter initialization (tests; real weights via checkpoint.py)
# ---------------------------------------------------------------------------

def _conv_p(key, kt, kh, kw, cin, cout, dtype):
    k = 1.0 / math.sqrt(cin * kt * kh * kw)
    return {
        "weight": jax.random.uniform(key, (kt, kh, kw, cin, cout),
                                     jnp.float32, -k, k).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _gn_p(c, dtype):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _lin_p(key, cin, cout, dtype):
    k = 1.0 / math.sqrt(cin)
    return {
        "weight": jax.random.uniform(key, (cin, cout), jnp.float32,
                                     -k, k).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _resnet_p(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_p(cin, dtype),
        "conv1": _conv_p(ks[0], 3, 3, 3, cin, cout, dtype),
        "norm2": _gn_p(cout, dtype),
        "conv2": _conv_p(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv_p(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _attn_p(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": _gn_p(c, dtype),
        "to_q": _lin_p(ks[0], c, c, dtype),
        "to_k": _lin_p(ks[1], c, c, dtype),
        "to_v": _lin_p(ks[2], c, c, dtype),
        "to_out": {"0": _lin_p(ks[3], c, c, dtype)},
    }


def init_vae_params(key, latent_channels: int = 16, dtype=jnp.float32,
                    block_out_channels: Sequence[int] = BLOCK_OUT_CHANNELS):
    """Random VAE pytree with the HF checkpoint layout (tests only)."""
    assert tuple(block_out_channels) == BLOCK_OUT_CHANNELS
    ks = iter(jax.random.split(key, 64))
    ch = block_out_channels

    down_blocks = {}
    c_in = ch[0]
    for i, (add_s, add_t) in enumerate(_down_plan()):
        blk = {"resnets": {}}
        c_out = ch[i]
        for j in range(LAYERS_PER_BLOCK):
            blk["resnets"][str(j)] = _resnet_p(
                next(ks), c_in if j == 0 else c_out, c_out, dtype)
        if add_s or add_t:
            blk["downsamplers"] = {
                "0": {"conv": _conv_p(next(ks), 3, 3, 3, c_out, c_out, dtype)}
            }
        down_blocks[str(i)] = blk
        c_in = c_out

    up_blocks = {}
    rev = list(reversed(ch))
    c_in = rev[0]
    for i, (add_s, add_t) in enumerate(_up_plan()):
        blk = {"resnets": {}}
        c_out = rev[i]
        for j in range(LAYERS_PER_BLOCK + 1):
            blk["resnets"][str(j)] = _resnet_p(
                next(ks), c_in if j == 0 else c_out, c_out, dtype)
        if add_s or add_t:
            blk["upsamplers"] = {
                "0": {"conv": _conv_p(next(ks), 3, 3, 3, c_out, c_out, dtype)}
            }
        up_blocks[str(i)] = blk
        c_in = c_out

    def mid(c):
        return {
            "resnets": {"0": _resnet_p(next(ks), c, c, dtype),
                        "1": _resnet_p(next(ks), c, c, dtype)},
            "attentions": {"0": _attn_p(next(ks), c, dtype)},
        }

    lc = latent_channels
    return {
        "encoder": {
            "conv_in": _conv_p(next(ks), 3, 3, 3, 3, ch[0], dtype),
            "down_blocks": down_blocks,
            "mid_block": mid(ch[-1]),
            "conv_norm_out": _gn_p(ch[-1], dtype),
            "conv_out": _conv_p(next(ks), 3, 3, 3, ch[-1], 2 * lc, dtype),
        },
        "decoder": {
            "conv_in": _conv_p(next(ks), 3, 3, 3, lc, ch[-1], dtype),
            "mid_block": mid(ch[-1]),
            "up_blocks": up_blocks,
            "conv_norm_out": _gn_p(ch[0], dtype),
            "conv_out": _conv_p(next(ks), 3, 3, 3, ch[0], 3, dtype),
        },
        "quant_conv": _conv_p(next(ks), 1, 1, 1, 2 * lc, 2 * lc, dtype),
        "post_quant_conv": _conv_p(next(ks), 1, 1, 1, lc, lc, dtype),
    }
