"""CLIP ViT-L/14 text encoder in JAX — pooled conditioning embedding.

The reference takes CLIPTextModel's ``pooler_output`` as a 768-d global
text embedding folded into the DiT time embedding
(/root/reference/kandinsky/models/text_embedders.py:12-31, dit.py:133-134).
This is the text transformer only: token+position embeddings, 12 pre-LN
blocks with quick-GELU MLPs, final LayerNorm, pooled at the first
end-of-text token (argmax of ids — EOT is the largest vocab id, and the
tokenizer pads with EOT so argmax finds the first one).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array

LAYERNORM_EPS = 1e-5


@dataclass(frozen=True)
class ClipTextConfig:
    """openai/clip-vit-large-patch14 text config."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    # HF CLIPTextModel pooling semantics: configs with the legacy
    # eos_token_id == 2 (the released CLIP ViT-L/14 config) pool at
    # argmax(input_ids) — EOT is the largest vocab id and pads are EOT;
    # newer configs pool at the FIRST position equal to eos_token_id
    # (transformers modeling_clip.CLIPTextTransformer.forward).
    eos_token_id: int = 2


def _ln(p, x):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LAYERNORM_EPS)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linear(p, x):
    y = jnp.dot(x, p["weight"], preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _attention(p, x, mask, num_heads):
    b, l, c = x.shape
    d = c // num_heads
    q = _linear(p["q_proj"], x).reshape(b, l, num_heads, d)
    k = _linear(p["k_proj"], x).reshape(b, l, num_heads, d)
    v = _linear(p["v_proj"], x).reshape(b, l, num_heads, d)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(d)
    s = jnp.where(mask[:, None, :, :], s, -1e30)
    probs = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(p["out_proj"], out.reshape(b, l, c))


def clip_text_forward(params, cfg: ClipTextConfig, input_ids: Array,
                      attention_mask: Array):
    """Returns (last_hidden (B, L, C), pooled (B, C))."""
    b, l = input_ids.shape
    x = jnp.take(params["embeddings"]["token_embedding"]["weight"],
                 input_ids, axis=0)
    x = x + params["embeddings"]["position_embedding"]["weight"][None, :l]
    causal = jnp.tril(jnp.ones((l, l), bool))
    mask = causal[None] & attention_mask[:, None, :].astype(bool)
    for i in range(cfg.num_hidden_layers):
        p = jax.tree.map(lambda a: a[i], params["layers"])
        h = _ln(p["layer_norm1"], x)
        x = x + _attention(p["self_attn"], h, mask, cfg.num_attention_heads)
        h = _ln(p["layer_norm2"], x)
        h = _linear(p["mlp"]["fc1"], h)
        h = quick_gelu(h)
        x = x + _linear(p["mlp"]["fc2"], h)
    x = _ln(params["final_layer_norm"], x)
    if cfg.eos_token_id == 2:
        # legacy configs (released ViT-L/14): argmax — EOT is the max
        # id and pads are EOT, so argmax finds the first one
        eot = jnp.argmax(input_ids, axis=-1)
    else:
        eot = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                         axis=-1)
    pooled = x[jnp.arange(b), eot]
    return x, pooled


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_pooled(params, cfg: ClipTextConfig, input_ids, attention_mask):
    return clip_text_forward(params, cfg, input_ids, attention_mask)[1]


def init_clip_params_random(key, cfg: ClipTextConfig, dtype=jnp.float32,
                            scale: float = 0.02):
    """Random CLIP text pytree matching convert_clip_state_dict's layout
    (bench/tests only)."""
    L, h, inter = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    ks = iter(jax.random.split(key, 16))

    def lin(i, o):
        return {"weight": jax.random.uniform(next(ks), (L, i, o), dtype,
                                             -scale, scale),
                "bias": jnp.zeros((L, o), dtype)}

    def ln():
        return {"weight": jnp.ones((L, h), dtype),
                "bias": jnp.zeros((L, h), dtype)}

    return {
        "embeddings": {
            "token_embedding": {"weight": jax.random.uniform(
                next(ks), (cfg.vocab_size, h), dtype, -scale, scale)},
            "position_embedding": {"weight": jax.random.uniform(
                next(ks), (cfg.max_position_embeddings, h), dtype,
                -scale, scale)},
        },
        "layers": {
            "layer_norm1": ln(),
            "layer_norm2": ln(),
            "self_attn": {"q_proj": lin(h, h), "k_proj": lin(h, h),
                          "v_proj": lin(h, h), "out_proj": lin(h, h)},
            "mlp": {"fc1": lin(h, inter), "fc2": lin(inter, h)},
        },
        "final_layer_norm": {"weight": jnp.ones((h,), dtype),
                             "bias": jnp.zeros((h,), dtype)},
    }
