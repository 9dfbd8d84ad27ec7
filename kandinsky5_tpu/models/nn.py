"""Functional JAX primitives for the Kandinsky-5 DiT.

TPU-native re-design of the reference building blocks
(/root/reference/kandinsky/models/nn.py). Parameters are plain pytrees
(nested dicts keyed like the torch module tree, with Linear weights stored
in JAX ``(in, out)`` convention) so checkpoint conversion is a transpose.

Mixed-precision policy (matches the reference's autocast placement):
  * matmuls / attention: bfloat16 on the MXU
  * LayerNorm / RMSNorm / modulation / time embedding / RoPE: float32
    (reference: nn.py:25-40 apply_* helpers, nn.py:56,109,131,162 autocasts)
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torch.nn.LayerNorm default eps (reference uses default-eps LayerNorms).
LAYERNORM_EPS = 1e-5
# torch.nn.RMSNorm(eps=None) resolves to float32 machine eps because the
# reference casts q/k to float32 before the norm (nn.py:193-197).
RMSNORM_EPS = float(np.finfo(np.float32).eps)

Array = jax.Array


# ---------------------------------------------------------------------------
# Elementary layers
# ---------------------------------------------------------------------------

def linear(p, x: Array, *, dtype=None) -> Array:
    """y = x @ W (+ b). W stored (in, out).

    Params produced by :func:`quantize_linear` (key ``weight_i8``) take
    the W8A8 dynamic-quantization path: the MXU runs int8 at 2x the
    bf16 rate, so the DiT's ~162 TFLOP/NFE of projections halve."""
    if "weight_i8" in p:
        return _linear_i8(p, x)
    w = p["weight"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype if dtype is None else dtype)


def _linear_i8(p, x: Array) -> Array:
    """W8A8 GEMM: per-token dynamic activation scales x per-out-channel
    weight scales (the standard symmetric-int8 recipe). s8xs8->s32 on
    the MXU; dequant is one fused rank-1 multiply."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-6) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8, p["weight_i8"],
        dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * p["w_scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_linear(p) -> dict:
    """bf16 linear params -> W8A8 params consumed by :func:`linear`.

    Weights quantize symmetrically per OUT channel (reduce over the
    ``in`` axis, which is axis -2 in the (in, out) layout — leading
    stacked-block axes pass through, so scan-stacked DiT blocks
    quantize in one call)."""
    w = p["weight"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True),
                    1e-6) * (1.0 / 127.0)
    w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"weight_i8": w8, "w_scale": jnp.squeeze(s, axis=-2)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def layer_norm(x: Array, *, weight=None, bias=None, eps=LAYERNORM_EPS) -> Array:
    """LayerNorm over the last axis in float32 (optionally affine)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def rms_norm(x: Array, weight: Array, eps=RMSNORM_EPS) -> Array:
    """RMSNorm in float32 (reference QK-norm: nn.py:175-176, 193-197)."""
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return xf * scale * weight.astype(jnp.float32)


def apply_scale_shift_norm(x: Array, scale: Array, shift: Array,
                           out_dtype=None) -> Array:
    """AdaLN: LayerNorm(x) * (scale + 1) + shift, fp32 compute, output in
    x.dtype (reference nn.py:25-28; bf16 in production, fp32 in parity
    tests — precision follows the parameter dtype throughout)."""
    y = layer_norm(x)
    y = y * (scale.astype(jnp.float32) + 1.0) + shift.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def apply_gate_sum(x: Array, out: Array, gate: Array,
                   out_dtype=None) -> Array:
    """x + gate * out in fp32 -> x.dtype (reference nn.py:30-33)."""
    y = x.astype(jnp.float32) + gate.astype(jnp.float32) * out.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def get_freqs(dim: int, max_period: float = 10000.0) -> np.ndarray:
    """exp(-log(max_period) * arange(dim) / dim), float32 on host
    (reference models/utils.py:21-28)."""
    return np.exp(
        -math.log(max_period) * np.arange(dim, dtype=np.float32) / dim
    ).astype(np.float32)


def time_embeddings(p, time: Array, model_dim: int,
                    max_period: float = 10000.0) -> Array:
    """Sinusoidal timestep embedding -> MLP(SiLU), all float32
    (reference TimeEmbeddings, nn.py:43-61)."""
    freqs = jnp.asarray(get_freqs(model_dim // 2, max_period))
    args = jnp.outer(time.astype(jnp.float32), freqs)
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = linear(p["in_layer"], emb, dtype=jnp.float32)
    h = jax.nn.silu(h)
    return linear(p["out_layer"], h, dtype=jnp.float32)


def text_embeddings(p, x: Array, out_dtype=None) -> Array:
    """Linear + affine LayerNorm (reference TextEmbeddings, nn.py:64-72).
    Output dtype follows the parameter dtype."""
    out_dtype = out_dtype or p["in_layer"]["weight"].dtype
    h = linear(p["in_layer"], x.astype(out_dtype))
    h = layer_norm(h, weight=p["norm"]["weight"], bias=p["norm"]["bias"])
    return h.astype(out_dtype)


def patchify(x: Array, patch_size: Sequence[int]) -> Array:
    """(B, T, H, W, C) -> (B, T/p0, H/p1, W/p2, p0*p1*p2*C) with inner order
    (p0, p1, p2, C) — exactly the reference VisualEmbeddings view/permute
    (nn.py:81-96)."""
    b, t, h, w, c = x.shape
    p0, p1, p2 = patch_size
    x = x.reshape(b, t // p0, p0, h // p1, p1, w // p2, p2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // p0, h // p1, w // p2, p0 * p1 * p2 * c)


def visual_embeddings(p, x: Array, patch_size: Sequence[int],
                      out_dtype=None) -> Array:
    out_dtype = out_dtype or p["in_layer"]["weight"].dtype
    return linear(p["in_layer"], patchify(x, patch_size).astype(out_dtype))


def unpatchify(x: Array, patch_size: Sequence[int], out_dim: int) -> Array:
    """(B, T', H', W', C*p0*p1*p2) -> (B, T, H, W, C) with inner order
    (C, p0, p1, p2) — exactly the reference OutLayer un-patchify
    (nn.py:384-399). Note the inner order differs from :func:`patchify`."""
    b, t, h, w, _ = x.shape
    p0, p1, p2 = patch_size
    x = x.reshape(b, t, h, w, out_dim, p0, p1, p2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * p0, h * p1, w * p2, out_dim)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_1d(positions: Array, head_dim: int,
            max_period: float = 10000.0) -> Tuple[Array, Array]:
    """cos/sin tables (L, head_dim//2) float32 (reference RoPE1D,
    nn.py:99-116)."""
    freqs = jnp.asarray(get_freqs(head_dim // 2, max_period))
    args = jnp.outer(positions.astype(jnp.float32), freqs)
    return jnp.cos(args), jnp.sin(args)


def rope_3d(
    grid: Tuple[int, int, int],
    positions: Tuple[Array, Array, Array],
    axes_dims: Sequence[int],
    scale_factor: Sequence[float] = (1.0, 1.0, 1.0),
    max_period: float = 10000.0,
) -> Tuple[Array, Array]:
    """cos/sin tables (T*H*W, sum(axes_dims)//2) float32.

    Per-axis angle tables (axes_dims of 16/24/24 halved), positions divided
    by scale_factor, broadcast over the 3D grid and concatenated — the
    reference RoPE3D (nn.py:119-150) without materializing 2x2 rotation
    matrices.
    """
    t, h, w = grid
    parts = []
    for ax, (dim, pos, sf) in enumerate(zip(axes_dims, positions, scale_factor)):
        freqs = jnp.asarray(get_freqs(dim // 2, max_period))
        args = jnp.outer(pos.astype(jnp.float32), freqs) / sf
        shape = [1, 1, 1, args.shape[-1]]
        shape[ax] = args.shape[0]
        parts.append(jnp.broadcast_to(args.reshape(shape), (t, h, w, args.shape[-1])))
    args = jnp.concatenate(parts, axis=-1)
    args = args.reshape(t * h * w, -1)
    return jnp.cos(args), jnp.sin(args)


def apply_rotary(x: Array, cos: Array, sin: Array) -> Array:
    """Rotate consecutive channel pairs: for each pair (x0, x1):
    (cos*x0 - sin*x1, sin*x0 + cos*x1). Float32 compute, bf16 out —
    equivalent to the reference's 2x2 rotation-matrix contraction
    (nn.py:35-40, verified in tests against the matrix form).

    x: (..., L, num_heads, head_dim); cos/sin: (L, head_dim//2).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], xf.shape[-1] // 2, 2)
    x0, x1 = x2[..., 0], x2[..., 1]
    # cos/sin broadcast over batch and heads: (L, 1, D/2)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    y0 = c * x0 - s * x1
    y1 = s * x0 + c * x1
    y = jnp.stack([y0, y1], axis=-1)
    return y.reshape(xf.shape).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Modulation / FF / attention projections
# ---------------------------------------------------------------------------

def modulation(p, time_embed: Array) -> Array:
    """SiLU -> Linear in float32 (reference Modulation, nn.py:153-164).
    Returns (B, num_params * model_dim) float32."""
    h = jax.nn.silu(time_embed.astype(jnp.float32))
    return linear(p["out_layer"], h, dtype=jnp.float32)


def feed_forward(p, x: Array) -> Array:
    """Linear -> exact GELU -> Linear, bf16, no biases (reference
    FeedForward, nn.py:352-361). Hidden activations shard over tp.

    On TPU, large bf16 blocks route to the fused Pallas kernel
    (ops/ff_pallas.py: hidden tile stays in VMEM, 155 vs 126 TF/s at
    the 5s block shape; opt out KANDINSKY5_TPU_FUSED_FF=0). Under an
    active tp mesh the fused path runs as the standard Megatron
    decomposition via shard_map — column-parallel W1, row-parallel W2,
    psum over tp — the same collective GSPMD inserts for the XLA chain,
    decided here on GLOBAL shapes so mesh and single chip always run
    the same algorithm for the same logical call."""
    import os

    from kandinsky5_tpu.parallel.sharding import active_mesh, constrain

    flag = os.environ.get("KANDINSKY5_TPU_FUSED_FF", "")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if ("weight" in p["in_layer"] and "bias" not in p["in_layer"]
            and "weight" in p["out_layer"] and flag != "0"
            and (on_tpu or flag == "force")):
        from kandinsky5_tpu.ops.ff_pallas import ff_supported, fused_ff

        w1 = p["in_layer"]["weight"]
        w2 = p["out_layer"]["weight"]
        mesh = active_mesh()
        if mesh is None or int(np.prod(list(mesh.shape.values()))) == 1:
            if ff_supported(x, w1, w2):
                return fused_ff(x, w1, w2, interpret=not on_tpu)
        else:
            y = _sharded_fused_ff(x, w1, w2, mesh)
            if y is not None:
                return y

    h = linear(p["in_layer"], x)
    h = constrain(h, "dp", None, "tp")
    h = jax.nn.gelu(h, approximate=False)
    return linear(p["out_layer"], h)


def modulated_feed_forward(p, x: Array, scale: Array, shift: Array,
                           gate: Array) -> Array:
    """The per-block FF sandwich — apply_scale_shift_norm -> feed_forward
    -> apply_gate_sum — as one logical op. On single-chip TPU the whole
    sandwich runs inside the fused Pallas kernel (ops/ff_pallas.py
    fused_ff_modulated): the normed input and the gated output never
    round-trip HBM. scale/shift/gate: (B, 1, D) from _mod_params."""
    import os

    from kandinsky5_tpu.parallel.sharding import active_mesh

    flag = os.environ.get("KANDINSKY5_TPU_FUSED_FF", "")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if ("weight" in p["in_layer"] and "bias" not in p["in_layer"]
            and "weight" in p["out_layer"] and flag != "0"
            and (on_tpu or flag == "force")):
        from kandinsky5_tpu.ops.ff_pallas import (ff_supported,
                                                  fused_ff_modulated)

        w1 = p["in_layer"]["weight"]
        w2 = p["out_layer"]["weight"]
        mesh = active_mesh()
        if ((mesh is None
             or int(np.prod(list(mesh.shape.values()))) == 1)
                and ff_supported(x, w1, w2)
                and scale.shape == (x.shape[0], 1, x.shape[-1])):
            return fused_ff_modulated(
                x, scale[:, 0], shift[:, 0], w1, w2, gate[:, 0],
                use_gate=True, interpret=not on_tpu)

    out = apply_scale_shift_norm(x, scale, shift)
    out = feed_forward(p, out)
    return apply_gate_sum(x, out, gate)


def _sharded_fused_ff(x: Array, w1: Array, w2: Array, mesh) -> Array | None:
    """Megatron FF over the mesh with the fused kernel per shard, or
    None when the decomposition does not apply (the caller falls back
    to the GSPMD XLA chain)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from kandinsky5_tpu.ops.ff_pallas import ff_supported, fused_ff

    b, l, d = x.shape
    ff = w1.shape[1]
    shape = dict(mesh.shape)
    tp_n = shape.get("tp", 1)
    if tp_n <= 1 or ff % tp_n:
        return None
    dp = "dp" if shape.get("dp", 1) > 1 and b % shape["dp"] == 0 else None
    sp_n = shape.get("sp", 1)
    sp = "sp" if sp_n > 1 and l % sp_n == 0 else None
    x_local = jax.ShapeDtypeStruct(
        (b // (shape["dp"] if dp else 1),
         l // (sp_n if sp else 1), d), x.dtype)
    w1_local = jax.ShapeDtypeStruct((d, ff // tp_n), w1.dtype)
    w2_local = jax.ShapeDtypeStruct((ff // tp_n, d), w2.dtype)
    if not ff_supported(x_local, w1_local, w2_local):
        return None
    interpret = jax.default_backend() not in ("tpu", "axon")

    def body(x_l, w1_l, w2_l):
        y = fused_ff(x_l, w1_l, w2_l, interpret=interpret)
        return jax.lax.psum(y, "tp")

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(dp, sp, None), P(None, "tp"), P("tp", None)),
        out_specs=P(dp, sp, None), check_rep=False,
    )(x, w1, w2)


def qkv_proj(p, x: Array, num_heads: int) -> Tuple[Array, Array, Array]:
    """Project to per-head Q/K/V with fp32 QK-RMSNorm (reference
    get_qkv + norm_qk, nn.py:180-197). x: (B, L, D) -> (B, L, H, hd)."""
    b, l, _ = x.shape
    q = linear(p["to_query"], x).reshape(b, l, num_heads, -1)
    k = linear(p["to_key"], x).reshape(b, l, num_heads, -1)
    v = linear(p["to_value"], x).reshape(b, l, num_heads, -1)
    q = rms_norm(q, p["query_norm"]["weight"]).astype(x.dtype)
    k = rms_norm(k, p["key_norm"]["weight"]).astype(x.dtype)
    return q, k, v
