"""DiffusionTransformer3D — the 2B Kandinsky-5 DiT, TPU-native.

Functional re-design of the reference model
(/root/reference/kandinsky/models/dit.py:82-186). Differences from the
torch original, on purpose:

  * Parameters are a pytree; the 32 visual blocks (and 2 text blocks) are
    *stacked* along a leading axis and executed with ``jax.lax.scan`` —
    one compiled block body instead of 32 unrolled ones.
  * Batch dimension is first-class: classifier-free guidance runs as a
    single batch-2 forward instead of two sequential calls.
  * Text is padded to a static length with a boolean mask instead of
    varlen cu_seqlens packing (TPU wants static shapes).
  * The torch.compile stage split (before_text / before_visual / after,
    dit.py:129-153) survives as the prologue / blocks / epilogue
    functions below — the seam MagCache needs — but everything runs
    under one outer jit.

Checkpoint schema (814 tensors, 2,007,702,848 params) is mapped 1:1 in
checkpoint.py; see SURVEY.md Appendix A.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.nn import (
    apply_gate_sum,
    apply_rotary,
    apply_scale_shift_norm,
    modulated_feed_forward,
    linear,
    modulation,
    qkv_proj,
    rms_norm,
    rope_1d,
    rope_3d,
    text_embeddings,
    time_embeddings,
    unpatchify,
    visual_embeddings,
)
from kandinsky5_tpu.ops.attention import attention
from kandinsky5_tpu.ops.fractal import fractal_flatten, fractal_unflatten
from kandinsky5_tpu.ops.nabla import nabla_attention
from kandinsky5_tpu.parallel.sharding import constrain_heads, constrain_seq

Array = jax.Array


class SparseParams(NamedTuple):
    """Static-shape NABLA parameters for one generation
    (reference get_sparse_params, generation_utils.py:10-36)."""

    sta: Array  # (s1, s1) bool sliding-tile block mask
    P: float  # top-CDF mass threshold
    max_density: Optional[float] = 0.75  # per-row kept-fraction ceiling
    # bank size / threshold algorithm (ops/nabla.py); (1, "sort",
    # max_density=None) is the exact-reference parity mode
    q_rows: int = 8
    method: str = "bisect"
    # shared-mask mode (framework extension, OFF by default): build the
    # adaptive mask ONCE per step from block 0's q/k and reuse it in
    # every layer — the reference rebuilds per layer per CFG branch
    # (~60 ms x 64 calls of mask+list work per 10s NFE pair)
    shared_mask: bool = False
    shared: Optional[object] = None  # ops.nabla.NablaMask once built


def _mod_params(mod_vec: Array, n: int):
    """Split a (B, n*D) modulation vector into n (B, 1, D) params —
    equivalent to the reference's nested torch.chunk (dit.py:34-35,62-65)."""
    b, nd = mod_vec.shape
    d = nd // n
    m = mod_vec.reshape(b, n, d)
    return [m[:, i][:, None, :] for i in range(n)]


def _self_attention(p, x: Array, rope, num_heads: int, kv_mask, attn_impl: str,
                    sparse: Optional[SparseParams]) -> Array:
    """Shared self-attention body (reference MultiheadSelfAttentionEnc/Dec,
    nn.py:166-298). rope = (cos, sin) tables or None."""
    b, l, d = x.shape
    q, k, v = qkv_proj(p, x, num_heads)
    q, k, v = constrain_heads(q), constrain_heads(k), constrain_heads(v)
    if rope is not None:
        cos, sin = rope
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
    if sparse is not None:
        out = nabla_attention(q, k, v, sparse.sta, thr=sparse.P,
                              impl=attn_impl, max_density=sparse.max_density,
                              q_rows=sparse.q_rows, method=sparse.method,
                              shared=sparse.shared)
    else:
        out = attention(q, k, v, kv_mask=kv_mask, impl=attn_impl)
    return linear(p["out_layer"], out.reshape(b, l, d))


def _cross_attention(p, x: Array, cond: Array, num_heads: int, kv_mask,
                     attn_impl: str) -> Array:
    """Visual->text cross-attention, no RoPE (reference
    MultiheadCrossAttention, nn.py:301-349)."""
    b, l, d = x.shape
    bc, lc, _ = cond.shape
    q = linear(p["to_query"], x).reshape(b, l, num_heads, -1)
    k = linear(p["to_key"], cond).reshape(bc, lc, num_heads, -1)
    v = linear(p["to_value"], cond).reshape(bc, lc, num_heads, -1)
    q = rms_norm(q, p["query_norm"]["weight"]).astype(x.dtype)
    k = rms_norm(k, p["key_norm"]["weight"]).astype(x.dtype)
    q, k, v = constrain_heads(q), constrain_heads(k), constrain_heads(v)
    out = attention(q, k, v, kv_mask=kv_mask, impl=attn_impl)
    return linear(p["out_layer"], out.reshape(b, l, d))


def text_encoder_block(p, x: Array, time_embed: Array, rope, kv_mask,
                       num_heads: int, attn_impl: str) -> Array:
    """AdaLN text block (reference TransformerEncoderBlock, dit.py:22-44)."""
    mod = modulation(p["text_modulation"], time_embed)
    shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = _mod_params(mod, 6)

    out = apply_scale_shift_norm(x, scale_sa, shift_sa)
    out = _self_attention(p["self_attention"], out, rope, num_heads, kv_mask,
                          attn_impl, sparse=None)
    x = apply_gate_sum(x, out, gate_sa)

    return modulated_feed_forward(p["feed_forward"], x,
                                  scale_ff, shift_ff, gate_ff)


def visual_decoder_block(p, visual: Array, text: Array, time_embed: Array,
                         rope, text_mask, num_heads: int, attn_impl: str,
                         sparse: Optional[SparseParams]) -> Array:
    """AdaLN visual block: self-attn + cross-attn + FF (reference
    TransformerDecoderBlock, dit.py:47-79)."""
    mod = modulation(p["visual_modulation"], time_embed)
    (shift_sa, scale_sa, gate_sa,
     shift_ca, scale_ca, gate_ca,
     shift_ff, scale_ff, gate_ff) = _mod_params(mod, 9)

    out = apply_scale_shift_norm(visual, scale_sa, shift_sa)
    out = _self_attention(p["self_attention"], out, rope, num_heads,
                          kv_mask=None, attn_impl=attn_impl, sparse=sparse)
    visual = apply_gate_sum(visual, out, gate_sa)

    out = apply_scale_shift_norm(visual, scale_ca, shift_ca)
    out = _cross_attention(p["cross_attention"], out, text, num_heads,
                           kv_mask=text_mask, attn_impl=attn_impl)
    visual = apply_gate_sum(visual, out, gate_ca)

    return modulated_feed_forward(p["feed_forward"], visual,
                                  scale_ff, shift_ff, gate_ff)


# ---------------------------------------------------------------------------
# Stages (the reference's compiled-stage seams, dit.py:129-153)
# ---------------------------------------------------------------------------

def dit_prologue(
    params,
    cfg: DiTParams,
    x: Array,
    text_embed: Array,
    pooled_text_embed: Array,
    time: Array,
    text_mask: Optional[Array],
    scale_factor: Sequence[float],
    attn_impl: str = "auto",
    to_fractal: bool = False,
):
    """Embeddings + text transformer blocks + RoPE3D + fractal flatten.

    x: (B, T, H, W, C_in); text_embed: (B, L, in_text_dim);
    pooled_text_embed: (B, in_text_dim2); time: (B,) already scaled by 1000.

    Returns (visual_embed (B,S,D), text_embed (B,L,D), time_embed (B,t),
    visual rope (cos,sin), grid).
    """
    num_heads = cfg.num_heads
    b, t, h, w, _ = x.shape
    grid = (t // cfg.patch_size[0], h // cfg.patch_size[1], w // cfg.patch_size[2])

    text = text_embeddings(params["text_embeddings"], text_embed)
    time_embed = time_embeddings(params["time_embeddings"], time, cfg.model_dim)
    pooled = text_embeddings(params["pooled_text_embeddings"], pooled_text_embed)
    time_embed = time_embed + pooled.astype(jnp.float32)

    visual = visual_embeddings(params["visual_embeddings"], x, cfg.patch_size)
    visual = visual.reshape(b, -1, cfg.model_dim)

    # text blocks with 1D RoPE over (possibly padded) positions
    l = text.shape[1]
    text_rope = rope_1d(jnp.arange(l), cfg.head_dim)
    for i in range(cfg.num_text_blocks):
        p_i = jax.tree.map(lambda a: a[i], params["text_transformer_blocks"])
        text = text_encoder_block(p_i, text, time_embed, text_rope, text_mask,
                                  num_heads, attn_impl)

    positions = tuple(jnp.arange(g) for g in grid)
    cos, sin = rope_3d(grid, positions, cfg.axes_dims, scale_factor)
    visual = fractal_flatten(visual, grid, block_mask=to_fractal)
    if to_fractal:
        cos = fractal_flatten(cos[None], grid)[0]
        sin = fractal_flatten(sin[None], grid)[0]
    return visual, text, time_embed, (cos, sin), grid


def dit_visual_blocks(
    params,
    cfg: DiTParams,
    visual: Array,
    text: Array,
    time_embed: Array,
    rope,
    text_mask,
    attn_impl: str = "auto",
    sparse: Optional[SparseParams] = None,
) -> Array:
    """The 32-block visual stack as one lax.scan over stacked params
    (~95% of DiT FLOPs; reference dit.py:176-178)."""
    num_heads = cfg.num_heads

    if sparse is not None and sparse.shared_mask and sparse.shared is None:
        sparse = sparse._replace(shared=_probe_shared_mask(
            params, cfg, visual, time_embed, rope, sparse))

    def body(carry, block_params):
        out = visual_decoder_block(block_params, carry, text, time_embed, rope,
                                   text_mask, num_heads, attn_impl, sparse)
        # sequence-parallel residual stream between blocks
        return constrain_seq(out), None

    # remat each block: free at inference (no backward), and keeps the
    # 32-deep backward inside HBM for training.py
    visual, _ = jax.lax.scan(jax.checkpoint(body), visual,
                             params["visual_transformer_blocks"])
    return visual


def _probe_shared_mask(params, cfg: DiTParams, visual, time_embed, rope,
                       sparse: SparseParams):
    """Shared-mask probe: replicate block 0's pre-attention transform
    (AdaLN scale/shift -> Q/K projections -> QK-RMSNorm -> RoPE) and
    build one NablaMask for the whole stack. Costs two extra (S, D) x
    (D, D) matmuls per step (~10 ms at the 10s shape) and makes every
    layer's mask identical to block 0's — a documented approximation
    (enable via DenoiseSpec.nabla_shared_mask / attention.shared_mask).
    """
    from kandinsky5_tpu.ops.nabla import nabla_build_mask

    p0 = jax.tree.map(lambda a: a[0], params["visual_transformer_blocks"])
    mod = modulation(p0["visual_modulation"], time_embed)
    shift_sa, scale_sa = _mod_params(mod, 9)[:2]
    x = apply_scale_shift_norm(visual, scale_sa, shift_sa)
    a = p0["self_attention"]
    b, l, _ = x.shape
    q = linear(a["to_query"], x).reshape(b, l, cfg.num_heads, -1)
    k = linear(a["to_key"], x).reshape(b, l, cfg.num_heads, -1)
    q = rms_norm(q, a["query_norm"]["weight"]).astype(x.dtype)
    k = rms_norm(k, a["key_norm"]["weight"]).astype(x.dtype)
    cos, sin = rope
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    return nabla_build_mask(q, k, sparse.sta, thr=sparse.P,
                            max_density=sparse.max_density,
                            q_rows=sparse.q_rows, method=sparse.method)


def dit_epilogue(params, cfg: DiTParams, visual: Array, time_embed: Array,
                 grid, to_fractal: bool = False) -> Array:
    """Unflatten + AdaLN-modulated OutLayer + unpatchify (reference
    after_blocks dit.py:149-153, OutLayer nn.py:364-400)."""
    visual = fractal_unflatten(visual, grid, block_mask=to_fractal)
    p = params["out_layer"]
    mod = modulation(p["modulation"], time_embed)
    shift, scale = _mod_params(mod, 2)
    visual = apply_scale_shift_norm(visual, scale, shift)
    x = linear(p["out_layer"], visual)
    b = x.shape[0]
    x = x.reshape(b, *grid, x.shape[-1])
    return unpatchify(x, cfg.patch_size, cfg.out_visual_dim)


def dit_forward(
    params,
    cfg: DiTParams,
    x: Array,
    text_embed: Array,
    pooled_text_embed: Array,
    time: Array,
    text_mask: Optional[Array] = None,
    scale_factor: Sequence[float] = (1.0, 1.0, 1.0),
    sparse: Optional[SparseParams] = None,
    attn_impl: str = "auto",
) -> Array:
    """Full forward: (B, T, H, W, C_in) -> (B, T, H, W, out_visual_dim).

    Matches reference DiffusionTransformer3D.forward (dit.py:155-181).
    """
    to_fractal = sparse is not None
    visual, text, time_embed, rope, grid = dit_prologue(
        params, cfg, x, text_embed, pooled_text_embed, time, text_mask,
        scale_factor, attn_impl, to_fractal)
    visual = dit_visual_blocks(params, cfg, visual, text, time_embed, rope,
                               text_mask, attn_impl, sparse)
    return dit_epilogue(params, cfg, visual, time_embed, grid, to_fractal)


# ---------------------------------------------------------------------------
# Initialization (tests / from-scratch use; checkpoints come via checkpoint.py)
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, bias=True, dtype=jnp.bfloat16, zero=False):
    if zero:
        w = jnp.zeros((d_in, d_out), dtype)
    else:
        k = 1.0 / math.sqrt(d_in)
        w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -k, k).astype(dtype)
    p = {"weight": w}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _init_attention(key, dim, head_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "to_query": _init_linear(ks[0], dim, dim, dtype=dtype),
        "to_key": _init_linear(ks[1], dim, dim, dtype=dtype),
        "to_value": _init_linear(ks[2], dim, dim, dtype=dtype),
        "out_layer": _init_linear(ks[3], dim, dim, dtype=dtype),
        "query_norm": {"weight": jnp.ones((head_dim,), dtype)},
        "key_norm": {"weight": jnp.ones((head_dim,), dtype)},
    }


def _init_text_block(key, cfg: DiTParams, dtype):
    ks = jax.random.split(key, 3)
    return {
        "text_modulation": {
            "out_layer": _init_linear(ks[0], cfg.time_dim, 6 * cfg.model_dim,
                                      dtype=dtype, zero=True)
        },
        "self_attention": _init_attention(ks[1], cfg.model_dim, cfg.head_dim, dtype),
        "feed_forward": {
            "in_layer": _init_linear(ks[2], cfg.model_dim, cfg.ff_dim, bias=False,
                                     dtype=dtype),
            "out_layer": _init_linear(ks[2], cfg.ff_dim, cfg.model_dim, bias=False,
                                      dtype=dtype),
        },
    }


def _init_visual_block(key, cfg: DiTParams, dtype):
    ks = jax.random.split(key, 4)
    return {
        "visual_modulation": {
            "out_layer": _init_linear(ks[0], cfg.time_dim, 9 * cfg.model_dim,
                                      dtype=dtype, zero=True)
        },
        "self_attention": _init_attention(ks[1], cfg.model_dim, cfg.head_dim, dtype),
        "cross_attention": _init_attention(ks[2], cfg.model_dim, cfg.head_dim, dtype),
        "feed_forward": {
            "in_layer": _init_linear(ks[3], cfg.model_dim, cfg.ff_dim, bias=False,
                                     dtype=dtype),
            "out_layer": _init_linear(ks[3], cfg.ff_dim, cfg.model_dim, bias=False,
                                      dtype=dtype),
        },
    }


def init_dit_params(key, cfg: DiTParams, dtype=jnp.bfloat16):
    """Random DiT parameter pytree with the released checkpoint's schema
    (stacked text/visual blocks)."""
    ks = jax.random.split(key, 8)
    text_blocks = [
        _init_text_block(k, cfg, dtype)
        for k in jax.random.split(ks[5], cfg.num_text_blocks)
    ]
    visual_blocks = [
        _init_visual_block(k, cfg, dtype)
        for k in jax.random.split(ks[6], cfg.num_visual_blocks)
    ]
    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "time_embeddings": {
            "in_layer": _init_linear(ks[0], cfg.model_dim, cfg.time_dim, dtype=dtype),
            "out_layer": _init_linear(ks[0], cfg.time_dim, cfg.time_dim, dtype=dtype),
        },
        "text_embeddings": {
            "in_layer": _init_linear(ks[1], cfg.in_text_dim, cfg.model_dim, dtype=dtype),
            "norm": {"weight": jnp.ones((cfg.model_dim,), dtype),
                     "bias": jnp.zeros((cfg.model_dim,), dtype)},
        },
        "pooled_text_embeddings": {
            "in_layer": _init_linear(ks[2], cfg.in_text_dim2, cfg.time_dim, dtype=dtype),
            "norm": {"weight": jnp.ones((cfg.time_dim,), dtype),
                     "bias": jnp.zeros((cfg.time_dim,), dtype)},
        },
        "visual_embeddings": {
            "in_layer": _init_linear(ks[3], cfg.patch_dim, cfg.model_dim, dtype=dtype),
        },
        "text_transformer_blocks": stack(text_blocks),
        "visual_transformer_blocks": stack(visual_blocks),
        "out_layer": {
            "modulation": {
                "out_layer": _init_linear(ks[4], cfg.time_dim, 2 * cfg.model_dim,
                                          dtype=dtype, zero=True)
            },
            "out_layer": _init_linear(
                ks[4], cfg.model_dim,
                math.prod(cfg.patch_size) * cfg.out_visual_dim, dtype=dtype),
        },
    }


def fast_init_dit_params(key, cfg: DiTParams, dtype=jnp.bfloat16,
                         scale: float = 0.02):
    """Random params from ONE flat RNG draw, sliced into leaves.

    init_dit_params builds an ~814-call RNG program whose XLA compile is
    slow at 2B scale; this variant compiles in seconds and is what
    entry()/bench use (weight *values* only matter for numerics tests,
    which use init_dit_params or converted checkpoints).
    """
    shapes = jax.eval_shape(
        lambda k: init_dit_params(k, cfg, dtype=dtype), key)
    leaves, treedef = jax.tree.flatten(shapes)
    sizes = [int(np.prod(l.shape)) for l in leaves]
    total = int(np.sum(sizes))
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    def build(key):
        flat = jax.random.uniform(key, (total,), jnp.float32, -scale, scale)
        out = []
        for i, l in enumerate(leaves):
            out.append(flat[offsets[i]:offsets[i + 1]]
                       .reshape(l.shape).astype(dtype))
        return jax.tree.unflatten(treedef, out)

    return jax.jit(build)(key)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def quantize_dit_params(params) -> dict:
    """W8A8-quantize the visual blocks' projection weights (self/cross
    attention QKV + out, FF in/out — the ~162 TFLOP/NFE of GEMMs that
    dominate non-attention denoise time). Norms, modulations,
    embeddings and the text blocks stay bf16. Inference-only opt-in
    (KANDINSKY5_TPU_INT8_LINEAR via the pipeline; accuracy recorded by
    bench.py as latent PSNR vs the bf16 path). TP sharding of the
    quantized tree is handled by
    parallel.sharding._adapt_quantized_specs."""
    from kandinsky5_tpu.models.nn import quantize_linear

    out = dict(params)
    vb = dict(params["visual_transformer_blocks"])
    for attn_key in ("self_attention", "cross_attention"):
        blk = dict(vb[attn_key])
        for proj in ("to_query", "to_key", "to_value", "out_layer"):
            blk[proj] = quantize_linear(blk[proj])
        vb[attn_key] = blk
    ff = dict(vb["feed_forward"])
    for proj in ("in_layer", "out_layer"):
        ff[proj] = quantize_linear(ff[proj])
    vb["feed_forward"] = ff
    out["visual_transformer_blocks"] = vb
    return out
