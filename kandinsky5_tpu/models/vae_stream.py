"""Streaming (state-carry) HunyuanVideo VAE decode.

The reference decodes long videos with overlap-tile temporal chunking:
stride-8/tile-17 frames re-decodes every overlap frame and linearly
blends the seams (/root/reference/kandinsky/models/vae.py:1144-1204) —
a measured 2.26x per-frame conv recompute at the 5s shape.

Every temporal op in the decoder is causal (causal convs, frame-causal
mid attention, causal nearest upsampling) EXCEPT GroupNorm, whose
statistics pool over the whole tile. So instead of re-decoding overlap
frames, this module decodes disjoint chunks while carrying exact
causal state across chunk boundaries:

  * each kt=3 causal conv carries its last 2 input frames (at that
    layer's temporal rate) — chunk boundaries are bit-exact vs an
    untiled decode for the conv path;
  * the mid attention carries a rolling window of past-frame K/V
    (``attn_past`` latent frames — matching the receptive field the
    reference's 5-latent-frame tiles give it);
  * GroupNorm pools per chunk (the same approximation the reference's
    tiling makes per tile, minus its seams and its 2.26x recompute).

The output is therefore NOT bit-identical to the reference's tiled
decode — it is a different approximation of the same untiled network,
with no blend seams. tests/test_vae_stream.py measures the PSNR gap
against the faithful tiled path; the pipeline enables streaming via
``HunyuanVideoVAE.decode(mode=...)``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kandinsky5_tpu.models.vae import (
    LAYERS_PER_BLOCK,
    _up_plan,
    causal_conv3d,
    conv1x1,
    group_norm,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Stream-stateful primitives: each returns (y, new_state)
# ---------------------------------------------------------------------------

def conv3d_stream(p, x: Array, hist: Optional[Array]) -> Tuple[Array, Array]:
    """Causal 3D conv over a chunk, carrying the (kt-1)-frame input tail.

    ``hist`` is None on the first chunk (time edge-padding, matching
    vae.causal_conv3d); afterwards the previous chunk's last kt-1 input
    frames. Spatial padding is per-call (edge), identical to the
    untiled conv since spatial extent is never chunked here.
    """
    w = p["weight"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt == 1:
        return causal_conv3d(p, x), None
    if hist is None:
        xt = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)),
                     mode="edge")
    else:
        xt = jnp.concatenate([hist.astype(x.dtype), x], axis=1)
    new_hist = xt[:, xt.shape[1] - (kt - 1):]
    from kandinsky5_tpu.models.vae import _conv_pallas_on

    if _conv_pallas_on(p, xt):
        # all-Pallas tower (see vae._conv_pallas_on): the carried
        # history frames are already normalized+activated, so the
        # kernel runs UNFUSED with the time prefix pre-attached
        from kandinsky5_tpu.models.vae import _int8_conv_on
        from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

        return causal_conv3d_fused(p, xt, time_padded=True,
                                    quant=_int8_conv_on()), new_hist
    xp = jnp.pad(xt, ((0, 0), (0, 0), (kh // 2, kh // 2),
                      (kw // 2, kw // 2), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_hist


def _gn_silu_conv_stream(p_norm, p_conv, x, hist):
    """GN -> SiLU -> streaming causal conv.

    With KANDINSKY5_TPU_PALLAS_FUSE=1 the GroupNorm fold + SiLU fuse
    into the conv kernel as in the tiled path (models/vae._gn_silu_conv)
    — the carried history planes, which the PREVIOUS chunk already
    normalized+activated, pass through the fused transform untouched
    (prefix_planes). GN statistics still pool over this chunk's x only,
    so the fused and unfused streams are numerically the same path, and
    the carried state stays the transformed input tail in both cases.
    Default is UNFUSED here — see vae._fuse_gn_on for the measured
    mode-dependent tradeoff.
    """
    from kandinsky5_tpu.models.vae import (
        _conv_pallas_on,
        _fuse_gn_on,
        _gn_fold,
        _int8_conv_on,
    )

    kt = p_conv["weight"].shape[0]
    if kt == 3 and _conv_pallas_on(p_conv, x) and _fuse_gn_on(default=False):
        from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

        quant = _int8_conv_on()
        scale_c, shift_c = _gn_fold(p_norm, x)
        scale, shift = scale_c[0], shift_c[0]
        # carried state = the transformed input tail, exactly what the
        # unfused path stores (conv3d_stream's concat-then-slice also
        # reaches into hist when the chunk is shorter than kt-1)
        th = x[:, -min(x.shape[1], kt - 1):].astype(jnp.float32)
        th = th * scale + shift
        th = (th * jax.nn.sigmoid(th)).astype(x.dtype)
        if hist is None:
            tail = jnp.pad(th, ((0, 0), (kt - 1 - th.shape[1], 0),
                                (0, 0), (0, 0), (0, 0)), mode="edge")
            # first chunk: edge time-padding replicates frame 0, and the
            # per-channel transform commutes with replication
            y = causal_conv3d_fused(p_conv, x, scale=scale, shift=shift,
                                    act=True, quant=quant)
        else:
            tail = jnp.concatenate([hist.astype(x.dtype), th],
                                   axis=1)[:, -(kt - 1):]
            xt = jnp.concatenate([hist.astype(x.dtype), x], axis=1)
            y = causal_conv3d_fused(p_conv, xt, scale=scale, shift=shift,
                                    act=True, time_padded=True,
                                    prefix_planes=kt - 1, quant=quant)
        return y, tail
    h = group_norm(p_norm, x)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return conv3d_stream(p_conv, h, hist)


def resnet_stream(p, x: Array, st: Optional[dict]) -> Tuple[Array, dict]:
    st = st or {}
    residual = x
    h, h1 = _gn_silu_conv_stream(p["norm1"], p["conv1"], x, st.get("conv1"))
    h, h2 = _gn_silu_conv_stream(p["norm2"], p["conv2"], h, st.get("conv2"))
    if "conv_shortcut" in p:
        residual = causal_conv3d(p["conv_shortcut"], residual)
    return h + residual, {"conv1": h1, "conv2": h2}


def attention_stream(p, x: Array, st: Optional[dict],
                     attn_past: int) -> Tuple[Array, dict]:
    """Frame-causal mid attention with a rolling ``attn_past``-frame KV
    window (reference semantics per tile: vae.py:278-362,110-122)."""
    b, t, h, w, c = x.shape
    s = h * w
    residual = x
    y = group_norm(p["group_norm"], x)
    tokens = y.reshape(b, t * s, c)
    q = (jnp.dot(tokens, p["to_q"]["weight"],
                 preferred_element_type=jnp.float32)
         + p["to_q"]["bias"].astype(jnp.float32))
    k = (jnp.dot(tokens, p["to_k"]["weight"],
                 preferred_element_type=jnp.float32)
         + p["to_k"]["bias"].astype(jnp.float32))
    v = (jnp.dot(tokens, p["to_v"]["weight"],
                 preferred_element_type=jnp.float32)
         + p["to_v"]["bias"].astype(jnp.float32))

    P = attn_past
    if st is None:
        k_buf = jnp.zeros((b, P, s, c), x.dtype)
        v_buf = jnp.zeros((b, P, s, c), x.dtype)
        filled = jnp.zeros((), jnp.int32)
    else:
        k_buf, v_buf, filled = st["k"], st["v"], st["filled"]

    k_all = jnp.concatenate([k_buf.reshape(b, P * s, c),
                             k.astype(x.dtype)], axis=1)
    v_all = jnp.concatenate([v_buf.reshape(b, P * s, c),
                             v.astype(x.dtype)], axis=1)
    # buffer slot j holds frame id j (newest at the right); chunk frame i
    # gets id P+i. Buffer validity: the newest ``filled`` slots.
    slot = jnp.arange(P, dtype=jnp.int32)
    buf_ids = jnp.repeat(slot, s)
    chunk_ids = jnp.repeat(P + jnp.arange(t, dtype=jnp.int32), s)
    kv_ids = jnp.broadcast_to(
        jnp.concatenate([buf_ids, chunk_ids])[None], (b, (P + t) * s))
    q_ids = jnp.broadcast_to(chunk_ids[None], (b, t * s))
    buf_valid = jnp.repeat(slot >= P - filled, s)
    kv_mask = jnp.broadcast_to(
        jnp.concatenate([buf_valid, jnp.ones((t * s,), bool)])[None],
        (b, (P + t) * s))

    from kandinsky5_tpu.ops.flash_pallas import flash_attention, flash_supported

    qh = q.astype(x.dtype)[:, :, None, :]
    if flash_supported(qh, qh) and (t * s) >= 2048:
        kh_ = k_all[:, :, None, :]
        vh_ = v_all[:, :, None, :]
        out = flash_attention(qh, kh_, vh_, kv_mask=kv_mask, q_ids=q_ids,
                              kv_ids=kv_ids, fixed_shift=False)[:, :, 0, :]
    else:
        import math

        scale = 1.0 / math.sqrt(c)
        scores = jnp.einsum("bld,bmd->blm", q, k_all.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
        allowed = ((q_ids[:, :, None] >= kv_ids[:, None, :])
                   & kv_mask[:, None, :])
        scores = jnp.where(allowed, scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("blm,bmd->bld", probs.astype(v_all.dtype), v_all,
                         preferred_element_type=jnp.float32)
    out = jnp.dot(out, p["to_out"]["0"]["weight"],
                  preferred_element_type=jnp.float32)
    out = out + p["to_out"]["0"]["bias"].astype(jnp.float32)
    out = out.reshape(b, t, h, w, c).astype(x.dtype)

    frames_k = jnp.concatenate([k_buf, k.astype(x.dtype).reshape(b, t, s, c)],
                               axis=1)
    frames_v = jnp.concatenate([v_buf, v.astype(x.dtype).reshape(b, t, s, c)],
                               axis=1)
    new_st = {"k": frames_k[:, -P:], "v": frames_v[:, -P:],
              "filled": jnp.minimum(filled + t, P)}
    return out + residual, new_st


def upsample_stream(p, x: Array, factor, hist: Optional[Array],
                    first: bool) -> Tuple[Array, Array]:
    """Causal nearest upsample + conv (vae.py:166-205). The
    first-global-frame special case (spatial-only upsample) applies only
    to the first chunk."""
    ft, fh, fw = factor
    if first:
        head, rest = x[:, :1], x[:, 1:]
        if fh > 1:
            head = jnp.repeat(jnp.repeat(head, fh, axis=2), fw, axis=3)
        if rest.shape[1] > 0:
            if ft > 1:
                rest = jnp.repeat(rest, ft, axis=1)
            if fh > 1:
                rest = jnp.repeat(jnp.repeat(rest, fh, axis=2), fw, axis=3)
            x = jnp.concatenate([head, rest], axis=1)
        else:
            x = head
    else:
        if ft > 1:
            x = jnp.repeat(x, ft, axis=1)
        if fh > 1:
            x = jnp.repeat(jnp.repeat(x, fh, axis=2), fw, axis=3)
    return conv3d_stream(p["conv"], x, hist)


# ---------------------------------------------------------------------------
# Streaming decoder tower
# ---------------------------------------------------------------------------

def decoder_stream(p, z: Array, state: Optional[dict], first: bool,
                   attn_past: int) -> Tuple[Array, dict]:
    """One chunk through the decoder (vae.decoder_forward layer-for-layer),
    threading per-layer causal state. ``state`` is None on the first
    chunk."""
    st = state or {}
    ns = {}
    h, ns["conv_in"] = conv3d_stream(p["conv_in"], z, st.get("conv_in"))
    mid = p["mid_block"]
    mst = st.get("mid", {})
    nmid = {}
    h, nmid["r0"] = resnet_stream(mid["resnets"]["0"], h, mst.get("r0"))
    h, nmid["attn"] = attention_stream(mid["attentions"]["0"], h,
                                       mst.get("attn"), attn_past)
    h, nmid["r1"] = resnet_stream(mid["resnets"]["1"], h, mst.get("r1"))
    ns["mid"] = nmid
    for i, (add_s, add_t) in enumerate(_up_plan()):
        blk = p["up_blocks"][str(i)]
        bst = st.get(f"up{i}", {})
        nblk = {}
        for j in range(LAYERS_PER_BLOCK + 1):
            h, nblk[f"r{j}"] = resnet_stream(blk["resnets"][str(j)], h,
                                             bst.get(f"r{j}"))
        if "upsamplers" in blk:
            factor = ((2 if add_t else 1), (2 if add_s else 1),
                      (2 if add_s else 1))
            h, nblk["ups"] = upsample_stream(blk["upsamplers"]["0"], h,
                                             factor, bst.get("ups"), first)
        ns[f"up{i}"] = nblk
    h = group_norm(p["conv_norm_out"], h)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    y, ns["conv_out"] = conv3d_stream(p["conv_out"], h, st.get("conv_out"))
    return y, ns


@functools.partial(jax.jit, static_argnames=("first", "attn_past"),
                   donate_argnums=(2,))
def _decode_chunk(params, z, state, first: bool, attn_past: int):
    z = conv1x1(params["post_quant_conv"], z)
    return decoder_stream(params["decoder"], z, state, first, attn_past)


def streaming_decode(params, z: Array, chunk_lat: int = 3,
                     attn_past: int = 4) -> Array:
    """(B, T', H', W', 16) latents -> (B, T, 8H', 8W', 3) sample, decoded
    in disjoint ``chunk_lat``-latent-frame chunks with carried causal
    state (donated across chunks). The first chunk takes chunk_lat+1
    frames (the +1 maps to the un-duplicated global first frame).

    Measured at the 5s production shape (768x512x121) on one 16 GB v5e,
    vs the reference-faithful tiled decode's 16.9 s: chunk_lat=3 9.18 s,
    chunk_lat=2 9.53 s, chunk_lat=4 OOM (the carried state + a 17-frame
    full-res activation set; the tiled path at that tile size JUST fits
    because it carries nothing)."""
    tf = z.shape[1]
    n0 = min(tf, chunk_lat + 1)
    out, state = _decode_chunk(params, z[:, :n0], None, True, attn_past)
    outs = [out]
    i = n0
    while i < tf:
        n = min(chunk_lat, tf - i)
        y, state = _decode_chunk(params, z[:, i:i + n], state, False,
                                 attn_past)
        outs.append(y)
        i += n
    return jnp.concatenate(outs, axis=1)
