"""Qwen2.5-VL text tower in JAX — conditioning encoder + prompt expander.

The reference conditions the DiT on the last hidden states of
Qwen2.5-VL-7B-Instruct via HF transformers
(/root/reference/kandinsky/models/text_embedders.py:34-95) and uses the
same model autoregressively for prompt expansion
(t2v_pipeline.py:47-88). This module implements the text transformer
(the vision tower is never exercised by the pipeline — prompts are
text-only) natively in JAX:

  * GQA attention (28 query / 4 kv heads, head_dim 128) with rotary
    embeddings (rope_theta 1e6). Qwen2.5-VL's multimodal mRoPE reduces
    to standard 1D RoPE for text-only inputs (all three position
    streams coincide), which is what the pipeline feeds it.
  * RMSNorm (eps 1e-6), SwiGLU MLP, QKV biases, untied lm_head.
  * `hidden_states[-1]` in HF is the post-final-norm sequence — that is
    what the conditioner consumes (text_embedders.py:84-88).
  * Greedy decoding with a static-shape KV cache for prompt expansion.

Weight conversion from the HF checkpoint: checkpoint.convert_qwen_state_dict.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class QwenTextConfig:
    """Qwen2.5-VL-7B-Instruct text config defaults."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False


def qwen_rms_norm(x: Array, weight: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * weight


def qwen_rope(positions: Array, head_dim: int, theta: float) -> Tuple[Array, Array]:
    """HF llama-style rotary tables: cos/sin (B, L, head_dim) with the
    frequency vector repeated twice (rotate-half convention)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * jnp.asarray(inv)[None, None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: (B, L, H, D); cos/sin: (B, L, D)."""
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    return (x.astype(jnp.float32) * c + rotate_half(x.astype(jnp.float32)) * s
            ).astype(x.dtype)


def _attn(p, x, cos, sin, cfg: QwenTextConfig, mask, cache=None, cache_pos=None):
    """GQA attention; returns (out, new_cache).

    mask: (B, Lq, Lk) bool allowed. cache: optional (2, B, Lmax, Hkv, D)
    with cache_pos the write offset (decode step).
    """
    b, l, _ = x.shape
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = (jnp.dot(x, p["q_proj"]["weight"], preferred_element_type=jnp.float32)
         + p["q_proj"]["bias"]).astype(x.dtype).reshape(b, l, hq, d)
    k = (jnp.dot(x, p["k_proj"]["weight"], preferred_element_type=jnp.float32)
         + p["k_proj"]["bias"]).astype(x.dtype).reshape(b, l, hkv, d)
    v = (jnp.dot(x, p["v_proj"]["weight"], preferred_element_type=jnp.float32)
         + p["v_proj"]["bias"]).astype(x.dtype).reshape(b, l, hkv, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is not None:
        k_cache, v_cache = cache[0], cache[1]
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, cache_pos, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, cache_pos, axis=1)
        k_full, v_full = k_cache, v_cache
        new_cache = jnp.stack([k_cache, v_cache])
    else:
        k_full, v_full = k, v
        new_cache = None

    rep = hq // hkv
    k_r = jnp.repeat(k_full, rep, axis=2)
    v_r = jnp.repeat(v_full, rep, axis=2)

    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k_r,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[:, None, :, :], s, -1e30)
    probs = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v_r.dtype), v_r,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, l, hq * d)
    out = jnp.dot(out, p["o_proj"]["weight"],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    return out, new_cache


def _mlp(p, x):
    g = jnp.dot(x, p["gate_proj"]["weight"], preferred_element_type=jnp.float32)
    u = jnp.dot(x, p["up_proj"]["weight"], preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return jnp.dot(h, p["down_proj"]["weight"],
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _layer(p, x, cos, sin, cfg, mask, cache=None, cache_pos=None):
    h = qwen_rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    attn_out, new_cache = _attn(p["self_attn"], h, cos, sin, cfg, mask,
                                cache, cache_pos)
    x = x + attn_out
    h = qwen_rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    x = x + _mlp(p["mlp"], h)
    return x, new_cache


def qwen_hidden_states(params, cfg: QwenTextConfig, input_ids: Array,
                       attention_mask: Array) -> Array:
    """(B, L) ids + (B, L) bool mask -> (B, L, hidden) post-final-norm
    hidden states (== HF output_hidden_states[-1])."""
    b, l = input_ids.shape
    x = jnp.take(params["embed_tokens"]["weight"], input_ids, axis=0)
    positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    cos, sin = qwen_rope(positions, cfg.head_dim, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((l, l), bool))
    mask = causal[None] & attention_mask[:, None, :]

    # scan over the stacked layer params (one traced layer instead of 28
    # unrolled copies): round-2 measured a 404 s cache-miss compile for
    # the unrolled encoder through the remote compile service; the decode
    # loop below already scans, the encoder now matches.
    def scan_layer(xc, p_i):
        xc, _ = _layer(p_i, xc, cos, sin, cfg, mask)
        return xc, None

    x, _ = jax.lax.scan(scan_layer, x, params["layers"])
    return qwen_rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _qwen_hidden_jit(params, cfg, input_ids, attention_mask):
    return qwen_hidden_states(params, cfg, input_ids, attention_mask)


def qwen_encode(params, cfg: QwenTextConfig, input_ids, attention_mask,
                crop_start: int):
    """Conditioning embeddings: hidden_states[-1][:, crop_start:] plus the
    cropped mask (reference text_embedders.py:83-95, padded instead of
    varlen-packed)."""
    hidden = _qwen_hidden_jit(params, cfg, jnp.asarray(input_ids),
                              jnp.asarray(attention_mask))
    return hidden[:, crop_start:], jnp.asarray(attention_mask)[:, crop_start:]


def qwen_param_shapes(cfg: QwenTextConfig):
    """ShapeDtypeStruct pytree matching convert_qwen_state_dict's layout
    (stacked layers)."""
    L, h, d = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    inter, V = cfg.intermediate_size, cfg.vocab_size

    def w(*s):
        return jax.ShapeDtypeStruct(s, jnp.float32)

    layers = {
        "input_layernorm": {"weight": w(L, h)},
        "post_attention_layernorm": {"weight": w(L, h)},
        "self_attn": {
            "q_proj": {"weight": w(L, h, hq * d), "bias": w(L, hq * d)},
            "k_proj": {"weight": w(L, h, hkv * d), "bias": w(L, hkv * d)},
            "v_proj": {"weight": w(L, h, hkv * d), "bias": w(L, hkv * d)},
            "o_proj": {"weight": w(L, hq * d, h)},
        },
        "mlp": {"gate_proj": {"weight": w(L, h, inter)},
                "up_proj": {"weight": w(L, h, inter)},
                "down_proj": {"weight": w(L, inter, h)}},
    }
    return {"embed_tokens": {"weight": w(V, h)}, "layers": layers,
            "norm": {"weight": w(h)}, "lm_head": {"weight": w(h, V)}}


def init_qwen_params_random(key, cfg: QwenTextConfig, dtype=jnp.bfloat16,
                            scale: float = 0.02):
    """Random full-size Qwen pytree generated on-device in the target
    dtype (bench/tests; real weights via checkpoint.py). Norm weights
    init to 1."""
    shapes = qwen_param_shapes(cfg)
    leaves, treedef = jax.tree.flatten_with_path(shapes)
    paths = [p for p, _ in leaves]
    structs = [l for _, l in leaves]

    def build(key):
        ks = jax.random.split(key, len(structs))
        out = []
        for path, k, l in zip(paths, ks, structs):
            if "layernorm" in str(path) or "norm" in str(path):
                out.append(jnp.ones(l.shape, dtype))
            else:
                out.append(jax.random.uniform(k, l.shape, dtype,
                                              -scale, scale))
        return jax.tree.unflatten(treedef, out)

    return jax.jit(build)(key)


# ---------------------------------------------------------------------------
# Greedy generation (prompt expansion)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def _prefill(params, cfg, ids, max_len):
    b, l = ids.shape
    x = jnp.take(params["embed_tokens"]["weight"], ids, axis=0)
    positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    cos, sin = qwen_rope(positions, cfg.head_dim, cfg.rope_theta)
    mask0 = jnp.tril(jnp.ones((l, l), bool))[None]
    # pad mask to the cache width
    mask = jnp.pad(mask0, ((0, 0), (0, 0), (0, max_len - l)))

    # scan (not unroll) the 28 layers; caches come out stacked
    # (L, 2, B, max_len, hkv, d) — exactly the decode loop's layout
    def scan_layer(xc, p_i):
        cache0 = jnp.zeros(
            (2, b, max_len, cfg.num_key_value_heads, cfg.head_dim),
            xc.dtype)
        xc, cache = _layer(p_i, xc, cos, sin, cfg, mask, cache0, 0)
        return xc, cache

    x, caches = jax.lax.scan(scan_layer, x, params["layers"])
    x = qwen_rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    logits = jnp.dot(x[:, -1], params["lm_head"]["weight"],
                     preferred_element_type=jnp.float32)
    return caches, jnp.argmax(logits, axis=-1)


_EOS_DEFAULT = (151645, 151643)  # <|im_end|>, <|endoftext|>


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "max_new",
                                             "eos_token_ids"),
                   donate_argnums=(1,))
def _decode_loop(params, caches, first_token, prompt_len, *, cfg,
                 max_len, max_new, eos_token_ids):
    """Whole greedy decode in ONE jitted lax.while_loop: the 28 per-layer
    caches live as one (L, 2, B, max_len, hkv, d) buffer scanned over
    with the stacked layer params and updated in place (donated) — no
    per-token host dispatch and no per-token cache restack. The scan
    reads each layer's weights straight out of the stacked pytree, so
    per-token HBM traffic stays ~one pass over the 15 GB of weights
    (measured ~19 ms/token on v5e — the bandwidth floor)."""
    eos_arr = jnp.asarray(eos_token_ids, jnp.int32)
    out0 = jnp.zeros((max_new,), jnp.int32).at[0].set(first_token[0])
    done0 = jnp.any(first_token[0] == eos_arr)

    def cond(st):
        _, _, _, _, n, done = st
        return (n < max_new) & ~done

    def body(st):
        caches, last, pos, out, n, done = st
        x = jnp.take(params["embed_tokens"]["weight"], last[:, None],
                     axis=0)
        cos, sin = qwen_rope(jnp.full((1, 1), pos, jnp.int32),
                             cfg.head_dim, cfg.rope_theta)
        mask = jnp.arange(max_len)[None, None, :] <= pos

        def scan_layer(xc, inp):
            p_i, cache_i = inp
            xc, new_cache = _layer(p_i, xc, cos, sin, cfg, mask,
                                   cache_i, pos)
            return xc, new_cache

        x, caches = jax.lax.scan(scan_layer, x,
                                 (params["layers"], caches))
        x = qwen_rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
        logits = jnp.dot(x[:, -1], params["lm_head"]["weight"],
                         preferred_element_type=jnp.float32)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        is_eos = jnp.any(token[0] == eos_arr)
        out = out.at[n].set(jnp.where(is_eos, 0, token[0]))
        n = n + jnp.where(is_eos, 0, 1)
        return caches, token, pos + 1, out, n, is_eos

    st = (caches, first_token, prompt_len, out0,
          jnp.where(done0, 0, 1), done0)
    st = jax.lax.while_loop(cond, body, st)
    return st[3], st[4]


def qwen_generate_greedy(params, cfg: QwenTextConfig, input_ids: np.ndarray,
                         max_new_tokens: int = 256,
                         eos_token_ids: Tuple[int, ...] = _EOS_DEFAULT,
                         ) -> np.ndarray:
    """Greedy decode (the reference's expand_prompt generation,
    t2v_pipeline.py:76-78, runs HF .generate with default greedy-ish
    sampling; we implement deterministic greedy). Single prompt (B=1).

    Returns the newly generated token ids (echo trimmed). The prefill
    and decode-loop jits live at module scope so repeat calls skip
    re-tracing (a measured ~6 s/call host cost when they were closures).
    """
    ids = np.asarray(input_ids, np.int32).reshape(1, -1)
    prompt_len = ids.shape[1]
    max_len = prompt_len + max_new_tokens

    caches, token = _prefill(params, cfg, jnp.asarray(ids), max_len)
    out, n = _decode_loop(params, caches, token.astype(jnp.int32),
                          jnp.int32(prompt_len), cfg=cfg, max_len=max_len,
                          max_new=max_new_tokens,
                          eos_token_ids=tuple(eos_token_ids))
    return np.asarray(out)[:int(n)]
