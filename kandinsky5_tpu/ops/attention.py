"""Attention ops for TPU: XLA reference paths + Pallas kernel dispatch.

The reference delegates to FlashAttention-2/3 CUDA kernels
(/root/reference/kandinsky/models/nn.py:9-23,201,254,336). Here the
same contract — non-causal multi-head attention, fp32 softmax, bf16
matmuls — is provided by:

  * :func:`dense_attention` — pure-XLA fallback (small shapes, CPU tests)
  * :func:`flash_attention` — Pallas TPU kernel (ops/flash_pallas.py)

Layout is (B, L, H, D) ("BLHD") everywhere, matching the natural output
of the QKV projections and avoiding extra transposes outside kernels.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def dense_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    scale: Optional[float] = None,
) -> Array:
    """Non-causal softmax attention via plain XLA einsums.

    q: (B, Lq, H, D); k, v: (B, Lk, H, D)
    kv_mask: optional (B, Lk) bool — True where the key is valid (used to
    mask padded text tokens; replaces the reference's varlen cu_seqlens).
    Returns (B, Lq, H, D) in q.dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if kv_mask is not None:
        neg = jnp.asarray(-1e30, dtype=s.dtype)
        s = jnp.where(kv_mask[:, None, None, :], s, neg)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhlm,bmhd->blhd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def _attention_local(q, k, v, kv_mask, impl):
    """Single-device dispatch (runs per shard under the sharded path).

    ``impl`` "flash_int8" (or KANDINSKY5_TPU_INT8_QK=1 upgrading "auto"/
    "flash") selects the SageAttention-style int8-QK kernel — an
    opt-in accuracy trade (see flash_pallas._pack_int8)."""
    if impl == "dense":
        return dense_attention(q, k, v, kv_mask=kv_mask)
    from kandinsky5_tpu.ops.flash_pallas import flash_attention, flash_supported

    int8_qk = impl == "flash_int8" or bool(os.environ.get(
        "KANDINSKY5_TPU_INT8_QK"))
    # fused Schraudolph exp2 on the int8 kernel (flash_pallas
    # ``fast_exp``): measured a NEGATIVE on v5e (86.0 vs 88.3 TFLOP/s
    # same run — TPU exp2 is not the VPU bottleneck), kept opt-in
    fast_exp = int8_qk and bool(os.environ.get("KANDINSKY5_TPU_FASTEXP"))
    if impl in ("flash", "flash_int8") or (
            impl == "auto" and flash_supported(q, k)):
        # an explicitly requested kernel runs in Pallas interpret mode
        # off-TPU so the virtual CPU mesh (tests, driver dryrun) can
        # exercise the exact kernel math the chip runs — including
        # flash_int8 under shard_map (first-class mesh option)
        interpret = jax.default_backend() not in ("tpu", "axon")
        return flash_attention(q, k, v, kv_mask=kv_mask, qk_int8=int8_qk,
                               fast_exp=fast_exp, interpret=interpret)
    return dense_attention(q, k, v, kv_mask=kv_mask)


def _sharded_attention(q, k, v, kv_mask, impl, mesh):
    """shard_map'd attention over ("dp", "sp", "tp"): batch over dp,
    heads over tp (whole heads per device), query SEQUENCE over sp with
    the K/V halves all-gathered inside (self-attention) — the Pallas
    kernel then runs on explicit per-device shapes instead of hoping
    GSPMD can partition an opaque custom call. 28 heads on 8 chips:
    tp=4 x sp=2 (parallel.sharding.plan_dit_mesh).

    Cross-attention (Lk != Lq, e.g. 256 text keys) keeps K/V whole per
    device: only the queries slice over sp.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    b, lq, h, _ = q.shape
    lk = k.shape[1]
    shape = dict(mesh.shape)
    dp = "dp" if shape.get("dp", 1) > 1 and b % shape["dp"] == 0 else None
    tp = "tp" if shape.get("tp", 1) > 1 and h % shape["tp"] == 0 else None
    sp_n = shape.get("sp", 1)
    sp = "sp" if sp_n > 1 and lq % sp_n == 0 else None
    if tp is None and sp is None and dp is None:
        return _attention_local(q, k, v, kv_mask, impl)
    self_attn = lk == lq
    kv_seq = sp if (self_attn and sp is not None) else None

    if kv_mask is None:
        def body(q_l, k_l, v_l):
            if kv_seq is not None:
                k_l = jax.lax.all_gather(k_l, kv_seq, axis=1, tiled=True)
                v_l = jax.lax.all_gather(v_l, kv_seq, axis=1, tiled=True)
            return _attention_local(q_l, k_l, v_l, None, impl)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(dp, sp, tp, None), P(dp, kv_seq, tp, None),
                      P(dp, kv_seq, tp, None)),
            out_specs=P(dp, sp, tp, None), check_rep=False,
        )(q, k, v)

    def body(q_l, k_l, v_l, m_l):
        if kv_seq is not None:
            k_l = jax.lax.all_gather(k_l, kv_seq, axis=1, tiled=True)
            v_l = jax.lax.all_gather(v_l, kv_seq, axis=1, tiled=True)
        return _attention_local(q_l, k_l, v_l, m_l, impl)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(dp, sp, tp, None), P(dp, kv_seq, tp, None),
                  P(dp, kv_seq, tp, None), P(dp, None)),
        out_specs=P(dp, sp, tp, None), check_rep=False,
    )(q, k, v, kv_mask)


def attention(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Optional[Array] = None,
    impl: str = "auto",
) -> Array:
    """Dispatch between the Pallas flash kernel and the XLA fallback.

    ``impl``: "auto" (flash on TPU when shapes allow, else dense),
    "flash", or "dense". Under an active multi-device mesh
    (parallel.sharding.sharding_ctx) the call routes through a
    shard_map decomposition (see _sharded_attention).
    """
    from kandinsky5_tpu.parallel.sharding import active_mesh

    if (impl != "dense" and k.shape[1] <= 512
            and q.shape[1] >= 4 * k.shape[1]
            and os.environ.get("KANDINSKY5_TPU_DENSE_CROSS") != "0"):
        # short-KV cross-attention (e.g. 47616 visual queries against
        # 256 text keys): the flash kernel's KV tiling wastes the MXU
        # here — measured 53.9 TF/s vs 61.7 dense at the 5s block shape
        # (tools/bench_block_decomp.py) — and the int8-QK variant would
        # quantize a 0.35 TF op for nothing. The dense einsum is the
        # same exact-softmax computation (not an approximation); the
        # lq >= 4*lk guard keeps text SELF-attention (lq == lk) on the
        # kernel path. Decided HERE on the GLOBAL shapes — never inside
        # the shard_map body — so a mesh and a single device always run
        # the same algorithm for the same logical call (the einsums are
        # plain XLA ops GSPMD partitions on its own); _attention_local
        # stays kernel-pure for explicit kernel tests.
        impl = "dense"
    mesh = active_mesh()
    if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
        return _sharded_attention(q, k, v, kv_mask, impl, mesh)
    return _attention_local(q, k, v, kv_mask, impl)


def flash_vs_dense_max_err(q, k, v, kv_mask=None) -> float:
    """Debug helper: numeric gap between the two implementations."""
    import numpy as np

    from kandinsky5_tpu.ops.flash_pallas import flash_attention

    f = flash_attention(q, k, v, kv_mask=kv_mask)
    d = dense_attention(q, k, v, kv_mask=kv_mask)
    return float(np.max(np.abs(np.asarray(f, np.float32) - np.asarray(d, np.float32))))
