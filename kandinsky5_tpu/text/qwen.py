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


def _lin(p, x):
    """fp32-accumulated projection; transparently reads either a dense
    ``weight`` or the int8 {weight_q, scale} pair produced by
    :func:`quantize_qwen_decode_params` (per-output-channel symmetric;
    the int8->bf16 convert fuses into the matmul's operand read, so
    per-token HBM weight traffic halves on the bandwidth-bound decode)."""
    if "weight" in p:
        return jnp.dot(x, p["weight"], preferred_element_type=jnp.float32)
    y = jnp.dot(x, p["weight_q"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    return y * p["scale"].astype(jnp.float32)


def _attn(p, x, cos, sin, cfg: QwenTextConfig, mask, cache=None, cache_pos=None):
    """GQA attention; returns (out, new_cache).

    mask: (B, Lq, Lk) bool allowed. cache: optional (2, B, Lmax, Hkv, D)
    with cache_pos the write offset (decode step).
    """
    b, l, _ = x.shape
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = (_lin(p["q_proj"], x)
         + p["q_proj"]["bias"]).astype(x.dtype).reshape(b, l, hq, d)
    k = (_lin(p["k_proj"], x)
         + p["k_proj"]["bias"]).astype(x.dtype).reshape(b, l, hkv, d)
    v = (_lin(p["v_proj"], x)
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
    out = _lin(p["o_proj"], out).astype(x.dtype)
    return out, new_cache


def _mlp(p, x):
    g = _lin(p["gate_proj"], x)
    u = _lin(p["up_proj"], x)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return _lin(p["down_proj"], h).astype(x.dtype)


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


def qwen_param_specs(params, mesh, axes=("sp", "tp")):
    """PartitionSpec pytree for the Qwen tower over ``axes`` of ``mesh``.

    The decode is HBM-bandwidth-bound (one pass over the ~15 GB of
    weights per token), so the goal is dividing the per-chip weight
    read by the shard count: every large matrix shards one dimension
    ``n``-ways — matmul-parallel where it matters (column-parallel
    q/k/v/gate/up/lm_head, row-parallel o/down, the reference leaves
    its text encoders replicated entirely, parallelize.py) — and
    anything not divisible replicates. Works for both the dense tree
    and the int8 decode tree (``weight_q``/``scale``).
    """
    from jax.sharding import PartitionSpec as P

    n = 1
    for a in axes:
        n *= mesh.shape.get(a, 1)
    ax = axes if len(axes) > 1 else axes[0]

    # row-parallel projections: shard the INPUT (contraction) axis; the
    # partial-sum output is all-reduced by XLA
    row_parallel = ("o_proj", "down_proj")

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leafname = names[-1]
        shape = leaf.shape
        if leafname in ("weight", "weight_q"):
            row = any(nm in row_parallel for nm in names)
            d_shard = len(shape) - (2 if row and len(shape) >= 2 else 1)
            if shape[d_shard] % n == 0 and not any(
                    "norm" in nm for nm in names):
                s = [None] * len(shape)
                s[d_shard] = ax
                return P(*s)
            return P()
        if leafname in ("bias", "scale"):
            row = any(nm in row_parallel for nm in names)
            if not row and shape[-1] % n == 0:
                s = [None] * (len(shape) - 1) + [ax]
                return P(*s)
            return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_qwen_params(params, mesh, axes=("sp", "tp")):
    """Place a Qwen param pytree onto ``mesh`` with the decode TP plan
    (see qwen_param_specs). The jitted encode/prefill/decode paths are
    untouched — GSPMD partitions them from the parameter shardings
    (per-token weight HBM traffic divides by the shard count; the
    row-parallel all-reduces are the projection's 25% latency fudge,
    bench.project_v5e8)."""
    from jax.sharding import NamedSharding

    specs = qwen_param_specs(params, mesh, axes)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs)


def quantize_qwen_decode_params(params):
    """Per-output-channel symmetric int8 quantization of every large
    projection (q/k/v/o, gate/up/down, lm_head) for the DECODE path.

    The greedy/sampled decode is HBM-bandwidth-bound (one pass over the
    ~15 GB bf16 weights per token, measured ~19 ms/token on v5e); int8
    storage halves that traffic. Quality-gated OPT-IN for prompt
    expansion only (embedder.expand_prompt / serve) — the conditioning
    encoder keeps the bf16 weights, its numerics feed the DiT. Layer
    norms, biases and the embedding table stay as-is.
    """
    @jax.jit
    def q(w):
        a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
        scale = jnp.maximum(a, 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                      -127, 127).astype(jnp.int8)
        return wq, scale.squeeze(-2)

    def quant_entry(p):
        wq, scale = q(p["weight"])
        out = {"weight_q": wq, "scale": scale}
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    layers = params["layers"]
    sa, mlp = layers["self_attn"], layers["mlp"]
    return {
        "embed_tokens": params["embed_tokens"],
        "norm": params["norm"],
        "lm_head": quant_entry(params["lm_head"]),
        "layers": {
            "input_layernorm": layers["input_layernorm"],
            "post_attention_layernorm": layers["post_attention_layernorm"],
            "self_attn": {k: quant_entry(sa[k]) for k in
                          ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {k: quant_entry(mlp[k]) for k in
                    ("gate_proj", "up_proj", "down_proj")},
        },
    }


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
    logits = _lin(params["lm_head"], x[:, -1])
    return caches, logits


_EOS_DEFAULT = (151645, 151643)  # <|im_end|>, <|endoftext|>


def _process_logits(logits, presence, *, temperature, top_p, top_k,
                    rep_penalty):
    """HF LogitsProcessor semantics: repetition penalty over every seen
    token (prompt + generated), then temperature, top-k, top-p."""
    if rep_penalty != 1.0:
        pen = jnp.where(logits > 0, logits / rep_penalty,
                        logits * rep_penalty)
        logits = jnp.where(presence[None], pen, logits)
    if temperature != 1.0:
        logits = logits / max(temperature, 1e-6)
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jax.lax.top_k(logits, logits.shape[-1])[0]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # HF TopPLogitsWarper: remove tokens whose cumulative probability
        # EXCLUSIVE of themselves already reaches top_p (always keeps >=1)
        cutoff_mask = (cum - probs) >= top_p
        cutoff = jnp.sum(~cutoff_mask, axis=-1) - 1
        thresh = jnp.take_along_axis(sorted_logits, cutoff[..., None],
                                     axis=-1)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return logits


def _pick_token(logits, presence, key, *, do_sample, temperature, top_p,
                top_k, rep_penalty):
    logits = _process_logits(logits, presence, temperature=temperature,
                             top_p=top_p, top_k=top_k,
                             rep_penalty=rep_penalty)
    if do_sample:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_len", "max_new", "eos_token_ids", "do_sample",
    "temperature", "top_p", "top_k", "rep_penalty"),
    donate_argnums=(1,))
def _decode_loop(params, caches, first_token, prompt_len, presence, rng,
                 *, cfg, max_len, max_new, eos_token_ids,
                 do_sample=False, temperature=1.0, top_p=1.0, top_k=0,
                 rep_penalty=1.0):
    """Whole decode in ONE jitted lax.while_loop: the 28 per-layer
    caches live as one (L, 2, B, max_len, hkv, d) buffer scanned over
    with the stacked layer params and updated in place (donated) — no
    per-token host dispatch and no per-token cache restack. The scan
    reads each layer's weights straight out of the stacked pytree, so
    per-token HBM traffic stays ~one pass over the 15 GB of weights
    (measured ~19 ms/token on v5e — the bandwidth floor).

    Greedy (do_sample=False, rep_penalty=1) is the deterministic default;
    the sampling statics implement the HF generation-config semantics
    the reference invokes via model.generate (t2v_pipeline.py:76-78) —
    repetition penalty over prompt+generated tokens, temperature,
    top-k, top-p, seeded categorical draw.
    """
    eos_arr = jnp.asarray(eos_token_ids, jnp.int32)
    out0 = jnp.zeros((max_new,), jnp.int32).at[0].set(first_token[0])
    done0 = jnp.any(first_token[0] == eos_arr)
    presence = presence.at[first_token[0]].set(True)

    def cond(st):
        return (st[4] < max_new) & ~st[5]

    def body(st):
        caches, last, pos, out, n, done, presence, rng = st
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
        logits = _lin(params["lm_head"], x[:, -1])
        rng, sub = jax.random.split(rng)
        token = _pick_token(logits, presence, sub, do_sample=do_sample,
                            temperature=temperature, top_p=top_p,
                            top_k=top_k, rep_penalty=rep_penalty)
        is_eos = jnp.any(token[0] == eos_arr)
        out = out.at[n].set(jnp.where(is_eos, 0, token[0]))
        n = n + jnp.where(is_eos, 0, 1)
        presence = presence.at[token[0]].set(True)
        return caches, token, pos + 1, out, n, is_eos, presence, rng

    st = (caches, first_token, prompt_len, out0,
          jnp.where(done0, 0, 1), done0, presence, rng)
    st = jax.lax.while_loop(cond, body, st)
    return st[3], st[4]


def qwen_generate(params, cfg: QwenTextConfig, input_ids: np.ndarray,
                  max_new_tokens: int = 256,
                  eos_token_ids: Tuple[int, ...] = _EOS_DEFAULT,
                  do_sample: bool = False, temperature: float = 1.0,
                  top_p: float = 1.0, top_k: int = 0,
                  repetition_penalty: float = 1.0,
                  seed: int = 0) -> np.ndarray:
    """Autoregressive decode, greedy by default. Single prompt (B=1).

    The sampling knobs mirror the HF generation config the reference's
    ``model.generate`` call picks up from the Qwen2.5-VL-Instruct
    checkpoint (t2v_pipeline.py:76-78); the text embedder reads that
    file and passes its values here (embedder.expand_prompt).

    Returns the newly generated token ids (echo trimmed). The prefill
    and decode-loop jits live at module scope so repeat calls skip
    re-tracing (a measured ~6 s/call host cost when they were closures).
    """
    ids = np.asarray(input_ids, np.int32).reshape(1, -1)
    prompt_len = ids.shape[1]
    max_len = prompt_len + max_new_tokens

    caches, logits = _prefill(params, cfg, jnp.asarray(ids), max_len)
    presence = jnp.zeros((cfg.vocab_size,), bool).at[ids[0]].set(True)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    statics = dict(do_sample=do_sample, temperature=float(temperature),
                   top_p=float(top_p), top_k=int(top_k),
                   rep_penalty=float(repetition_penalty))
    token = _pick_token(logits, presence, sub, **statics)
    out, n = _decode_loop(params, caches, token,
                          jnp.int32(prompt_len), presence, key, cfg=cfg,
                          max_len=max_len, max_new=max_new_tokens,
                          eos_token_ids=tuple(eos_token_ids), **statics)
    return np.asarray(out)[:int(n)]


def qwen_generate_greedy(params, cfg: QwenTextConfig, input_ids: np.ndarray,
                         max_new_tokens: int = 256,
                         eos_token_ids: Tuple[int, ...] = _EOS_DEFAULT,
                         ) -> np.ndarray:
    """Deterministic greedy decode (back-compat alias of qwen_generate)."""
    return qwen_generate(params, cfg, input_ids,
                         max_new_tokens=max_new_tokens,
                         eos_token_ids=eos_token_ids)
