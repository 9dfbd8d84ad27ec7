"""Qwen2.5-VL vision tower (ViT) in JAX.

The reference loads the FULL Qwen2.5-VL model via HF transformers
(/root/reference/kandinsky/models/text_embedders.py:56-63) even though
the T2V pipeline only ever feeds text (images=None,
text_embedders.py:74-81). This module completes the model surface
natively so image-conditioned extensions don't need torch:

  * 3D patch embed (2x14x14, conv==reshape+matmul on TPU — the stride
    equals the kernel, so each patch is one flattened GEMM row);
  * 2D rotary embeddings over the merger-permuted (h, w) grid
    (HF Qwen2_5_VisionRotaryEmbedding, theta 1e4, head_dim/2 rotary);
  * windowed attention via SEGMENT IDS instead of the reference's
    varlen cu_seqlens: each token carries its window id and attention
    allows seg_i == seg_j — static shapes, one masked dense attention
    per block (XLA-friendly; the flash kernel path is unnecessary at
    ViT sequence lengths). Full-attention blocks
    (config.fullatt_block_indexes) select the per-image segment ids
    instead — a per-layer elementwise id select inside one lax.scan
    over the stacked blocks;
  * spatial patch merger (RMSNorm -> 4-patch concat -> MLP) and the
    window-index inverse permutation.

Semantics mirror transformers' Qwen2_5_VisionTransformerPretrainedModel
(modeling_qwen2_5_vl.py); parity: tests/test_qwen_vision.py.
Weight conversion: checkpoint.convert_qwen_vision_state_dict.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class QwenVisionConfig:
    """Qwen2.5-VL-7B vision defaults (HF config.json vision_config)."""

    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    out_hidden_size: int = 3584
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# ---------------------------------------------------------------------------
# Host-side index precomputation (grid_thw is host data in HF too)
# ---------------------------------------------------------------------------

def rot_pos_ids(cfg: QwenVisionConfig, grid_thw: np.ndarray) -> np.ndarray:
    """(S, 2) (h, w) position ids in the spatial-merge-permuted order
    (HF rot_pos_emb, modeling_qwen2_5_vl.py)."""
    sm = cfg.spatial_merge_size
    out = []
    for t, h, w in np.asarray(grid_thw):
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hp = hp.reshape(h // sm, sm, w // sm, sm).transpose(0, 2, 1, 3).ravel()
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wp = wp.reshape(h // sm, sm, w // sm, sm).transpose(0, 2, 1, 3).ravel()
        out.append(np.tile(np.stack([hp, wp], axis=-1), (t, 1)))
    return np.concatenate(out, axis=0)


def window_index(cfg: QwenVisionConfig, grid_thw: np.ndarray):
    """(window_index (S/4,), cu_window_seqlens) — HF get_window_index.
    The index permutes 4-patch merge units into window-contiguous order;
    cu boundaries delimit each window's tokens in that order."""
    sm = cfg.spatial_merge_size
    unit = sm * sm
    vit_ws = cfg.window_size // sm // cfg.patch_size
    idx_list = []
    cu = [0]
    base = 0
    for t, h, w in np.asarray(grid_thw):
        lh, lw = h // sm, w // sm
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = vit_ws - lh % vit_ws
        pad_w = vit_ws - lw % vit_ws
        nh = (lh + pad_h) // vit_ws
        nw = (lw + pad_w) // vit_ws
        padded = np.pad(index, ((0, 0), (0, pad_h), (0, pad_w)),
                        constant_values=-100)
        padded = padded.reshape(t, nh, vit_ws, nw, vit_ws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(
            t, nh * nw, vit_ws, vit_ws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        flat = flat[flat != -100]
        idx_list.append(flat + base)
        cu.extend((np.cumsum(seqlens) * unit + cu[-1]).tolist())
        base += t * lh * lw
    cu = np.asarray(cu, np.int64)
    # unique_consecutive (empty windows from padding produce repeats)
    keep = np.ones(len(cu), bool)
    keep[1:] = cu[1:] != cu[:-1]
    return np.concatenate(idx_list), cu[keep]


def _segments_from_cu(cu: np.ndarray, total: int) -> np.ndarray:
    seg = np.zeros(total, np.int32)
    for i in range(len(cu) - 1):
        seg[cu[i]:cu[i + 1]] = i
    return seg


def vision_indices(cfg: QwenVisionConfig, grid_thw: np.ndarray):
    """All host-side index tensors for one forward: returns dict with
    window_index, its inverse, per-token window/full segment ids (in the
    window-permuted order) and the (S, 2) rotary position ids (also
    permuted)."""
    grid_thw = np.asarray(grid_thw)
    unit = cfg.spatial_merge_size ** 2
    total = int((grid_thw[:, 0] * grid_thw[:, 1] * grid_thw[:, 2]).sum())
    widx, cu_win = window_index(cfg, grid_thw)
    # per-image/frame segment boundaries (full-attention blocks):
    # repeat_interleave(h*w, t) per sample, cumsum
    lens = np.repeat(grid_thw[:, 1] * grid_thw[:, 2], grid_thw[:, 0])
    cu_full = np.concatenate([[0], np.cumsum(lens)])
    seg_full = _segments_from_cu(cu_full, total)
    seg_win = _segments_from_cu(cu_win, total)

    pos = rot_pos_ids(cfg, grid_thw)
    # permute rotary ids and the full-attn segment ids into the
    # window-contiguous order (HF permutes hidden_states + rotary by
    # window_index at merge-unit granularity; seg_win is already built
    # in that order)
    perm = (widx[:, None] * unit + np.arange(unit)[None]).reshape(-1)
    inv = np.argsort(widx)
    return dict(window_index=widx, inverse=inv, perm=perm,
                seg_full=seg_full[perm], seg_win=seg_win,
                pos_ids=pos[perm], total=total)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                          + eps)
    return (xf * scale).astype(x.dtype) * w


def _rot_tables(cfg: QwenVisionConfig, pos_ids: np.ndarray):
    dim = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    h = pos_ids[:, 0:1].astype(np.float32) * inv[None]
    w = pos_ids[:, 1:2].astype(np.float32) * inv[None]
    freqs = np.concatenate([h, w], axis=-1)         # (S, head_dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)   # (S, head_dim)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _block(p, x, cos, sin, seg, cfg: QwenVisionConfig):
    """One ViT block: RMSNorm -> segment-masked attention -> RMSNorm ->
    biased SwiGLU MLP. x: (S, C); seg: (S,) int32 window/image id."""
    h = _rms(x, p["norm1"]["weight"])
    s, c = h.shape
    nh, d = cfg.num_heads, cfg.head_dim
    qkv = (jnp.dot(h, p["attn"]["qkv"]["weight"],
                   preferred_element_type=jnp.float32)
           + p["attn"]["qkv"]["bias"]).astype(x.dtype)
    q, k, v = jnp.split(qkv.reshape(s, 3, nh, d), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]
    cs, sn = cos[:, None, :], sin[:, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q = (qf * cs + _rotate_half(qf) * sn).astype(x.dtype)
    k = (kf * cs + _rotate_half(kf) * sn).astype(x.dtype)

    scores = jnp.einsum("lhd,mhd->hlm", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d)
    allowed = seg[:, None] == seg[None, :]
    scores = jnp.where(allowed[None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hlm,mhd->lhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(s, c).astype(x.dtype)
    out = (jnp.dot(out, p["attn"]["proj"]["weight"],
                   preferred_element_type=jnp.float32)
           + p["attn"]["proj"]["bias"]).astype(x.dtype)
    x = x + out

    h = _rms(x, p["norm2"]["weight"])
    g = (jnp.dot(h, p["mlp"]["gate_proj"]["weight"],
                 preferred_element_type=jnp.float32)
         + p["mlp"]["gate_proj"]["bias"])
    u = (jnp.dot(h, p["mlp"]["up_proj"]["weight"],
                 preferred_element_type=jnp.float32)
         + p["mlp"]["up_proj"]["bias"])
    m = (jax.nn.silu(g) * u).astype(x.dtype)
    m = (jnp.dot(m, p["mlp"]["down_proj"]["weight"],
                 preferred_element_type=jnp.float32)
         + p["mlp"]["down_proj"]["bias"]).astype(x.dtype)
    return x + m


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vision_jit(params, cfg, patches, cos, sin, seg_full, seg_win,
                full_flags, perm, inverse):
    # patch embed: stride==kernel conv -> one GEMM over flattened patches
    w = params["patch_embed"]["proj"]["weight"]  # (embed, C*tps*ps*ps)
    x = jnp.dot(patches, w.T, preferred_element_type=jnp.float32
                ).astype(w.dtype)
    x = x[perm]  # window-contiguous order (merge-unit granularity)

    def scan_layer(xc, inp):
        p_i, full_i = inp
        seg = jnp.where(full_i, seg_full, seg_win)
        return _block(p_i, xc, cos, sin, seg, cfg), None

    x, _ = jax.lax.scan(scan_layer, x, (params["blocks"], full_flags))

    # merger: RMSNorm -> concat 2x2 merge unit -> Linear/GELU/Linear
    m = params["merger"]
    x = _rms(x, m["ln_q"]["weight"])
    unit = cfg.spatial_merge_size ** 2
    x = x.reshape(-1, unit * cfg.hidden_size)
    x = (jnp.dot(x, m["mlp"]["0"]["weight"],
                 preferred_element_type=jnp.float32)
         + m["mlp"]["0"]["bias"])
    x = jax.nn.gelu(x, approximate=False)
    x = (jnp.dot(x.astype(m["mlp"]["2"]["weight"].dtype),
                 m["mlp"]["2"]["weight"],
                 preferred_element_type=jnp.float32)
         + m["mlp"]["2"]["bias"])
    return x[inverse].astype(w.dtype)


def load_vision_tower(checkpoint_path: str, dtype=jnp.bfloat16):
    """(params, cfg) from an HF Qwen2.5-VL checkpoint directory — the
    companion to Kandinsky5TextEmbedder.from_pretrained, which converts
    only the text tower (the T2V pipeline never feeds images)."""
    import json
    import os

    from kandinsky5_tpu.checkpoint import convert_qwen_vision_state_dict
    from kandinsky5_tpu.utils.io import load_sharded_safetensors

    cfg = QwenVisionConfig()
    try:
        with open(os.path.join(str(checkpoint_path), "config.json")) as f:
            vc = json.load(f).get("vision_config", {})
        cfg = QwenVisionConfig(**{
            k: (tuple(v) if k == "fullatt_block_indexes" else v)
            for k, v in vc.items()
            if k in QwenVisionConfig.__dataclass_fields__})
    except (OSError, ValueError):
        pass
    params = convert_qwen_vision_state_dict(
        load_sharded_safetensors(checkpoint_path), dtype=dtype)
    return params, cfg


def vision_forward(params, cfg: QwenVisionConfig, pixel_patches,
                   grid_thw) -> Array:
    """(S, C*tps*ps*ps) flattened patches + (N, 3) grid -> merged
    (S/4, out_hidden) image embeddings (== HF visual(pixel_values,
    grid_thw)). ``pixel_patches`` uses HF's pixel_values layout (the
    processor emits patches already flattened)."""
    idx = vision_indices(cfg, np.asarray(grid_thw))
    cos, sin = _rot_tables(cfg, idx["pos_ids"])
    full_flags = np.zeros(cfg.depth, bool)
    full_flags[list(cfg.fullatt_block_indexes)] = True
    return _vision_jit(
        params, cfg, jnp.asarray(pixel_patches), cos, sin,
        jnp.asarray(idx["seg_full"]), jnp.asarray(idx["seg_win"]),
        jnp.asarray(full_flags), jnp.asarray(idx["perm"]),
        jnp.asarray(idx["inverse"]))
