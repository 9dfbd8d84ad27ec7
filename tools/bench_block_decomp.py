"""Per-component decomposition of one visual DiT block at the 5s
headline shape (batch 1, S=47616, D=1792, 28 heads, 256 text keys —
the distill config is no-CFG, so the NFE IS one batch-1 forward).

Completes the round-5 evidence chain: the flash-kernel core and the
VAE conv tower are measured AT their achievable ceilings
(tools/bench_i8_decomp.py, tools/bench_vae_stream_decomp.py); this
tool prices everything else in the block so the remaining gap between
the measured NFE (6.26 s int8-QK = 196 ms/block) and the achievable
floor (163 ms/block) is attributed, not guessed.

Each component is timed as an n-deep jitted chain (carried output ->
next input) so per-call dispatch does not pollute sub-100 ms pieces.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_block_decomp.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from kandinsky5_tpu.models import nn as dnn
from kandinsky5_tpu.models.dit import (
    _cross_attention,
    _mod_params,
    _self_attention,
    visual_decoder_block,
)
from kandinsky5_tpu.ops.attention import attention

D, FF, H, HD, S, LT = 1792, 7168, 28, 64, 47616, 256
BF = jnp.bfloat16


def build_params(key):
    ks = iter(jax.random.split(key, 40))

    def w(*shape, dt=BF):
        return jax.random.normal(next(ks), shape, dt) * 0.02

    p_sa = {"to_query": {"weight": w(D, D), "bias": w(D)},
            "to_key": {"weight": w(D, D), "bias": w(D)},
            "to_value": {"weight": w(D, D), "bias": w(D)},
            "out_layer": {"weight": w(D, D), "bias": w(D)},
            "query_norm": {"weight": w(HD)},
            "key_norm": {"weight": w(HD)}}
    p_ca = {k: {kk: w(*vv.shape, dt=vv.dtype) for kk, vv in v.items()}
            for k, v in p_sa.items()}
    p_ff = {"in_layer": {"weight": w(D, FF)},
            "out_layer": {"weight": w(FF, D)}}
    p_mod = {"out_layer": {"weight": w(512, 9 * D, dt=jnp.float32),
                           "bias": w(9 * D, dt=jnp.float32)}}
    return {"visual_modulation": p_mod, "self_attention": p_sa,
            "cross_attention": p_ca, "feed_forward": p_ff}


def timed_chain(fn, x0, n, label, flops=None):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        for _ in range(n):
            x = fn(x)
        return x

    chain(x0, n).block_until_ready()          # compile + warm
    t0 = time.perf_counter()
    chain(x0, n).block_until_ready()
    t = (time.perf_counter() - t0) / n
    rate = f", {flops / t / 1e12:.1f} TF/s" if flops else ""
    print(f"  {label:<28s} {t * 1e3:7.2f} ms{rate}", flush=True)
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    p = build_params(jax.random.PRNGKey(0))
    kx = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(kx[0], (1, S, D), BF)
    text = jax.random.normal(kx[1], (1, LT, D), BF)
    temb = jax.random.normal(kx[2], (1, 512), jnp.float32)
    tmask = jnp.ones((1, LT), bool)
    cos, sin = dnn.rope_1d(jnp.arange(S), HD)
    rope = (cos, sin)
    qh = jax.random.normal(kx[3], (1, S, H, HD), BF)

    att_flops = 4 * S * S * HD * H
    lin_flops = 2 * S * D * D * 4 + 2 * S * D * FF * 2   # qkvo + ff
    ca_flops = (2 * S * D * D * 2                         # q + out proj
                + 2 * LT * D * D * 2                      # k,v proj
                + 4 * S * LT * HD * H)                    # scores + pv

    res = {}
    for impl in ("flash_int8", "auto"):
        print(f"[{impl}] per-component (n-deep jitted chains):",
              flush=True)
        res[impl] = {}
        res[impl]["block"] = timed_chain(
            lambda v_: visual_decoder_block(
                p, v_, text, temb, rope, tmask, H, impl, None),
            x, 6, "whole block",
            flops=att_flops + lin_flops + ca_flops)
        res[impl]["self_attention"] = timed_chain(
            lambda v_: _self_attention(
                p["self_attention"], v_, rope, H, None, impl, None),
            x, 6, "self-attn (proj+rope+kernel)",
            flops=att_flops + 2 * S * D * D * 4)
        res[impl]["att_core"] = timed_chain(
            lambda q_: attention(q_, q_, q_, impl=impl),
            qh, 6, "attention kernel core", flops=att_flops)
        res[impl]["cross_attention"] = timed_chain(
            lambda v_: _cross_attention(
                p["cross_attention"], v_, text, H, tmask, impl),
            x, 8, "cross-attn (full)", flops=ca_flops)
        res[impl]["cross_dense"] = timed_chain(
            lambda v_: _cross_attention(
                p["cross_attention"], v_, text, H, tmask, "dense"),
            x, 8, "cross-attn (dense XLA)", flops=ca_flops)
        res[impl]["feed_forward"] = timed_chain(
            lambda v_: dnn.feed_forward(p["feed_forward"], v_),
            x, 8, "feed-forward", flops=2 * S * D * FF * 2)

        def adaln_only(v_):
            mod = dnn.modulation(p["visual_modulation"], temb)
            sh, sc, g = _mod_params(mod, 9)[:3]
            out = dnn.apply_scale_shift_norm(v_, sc, sh)
            out = dnn.apply_gate_sum(v_, out, g)
            out = dnn.apply_scale_shift_norm(out, sc, sh)
            out = dnn.apply_gate_sum(v_, out, g)
            out = dnn.apply_scale_shift_norm(out, sc, sh)
            return dnn.apply_gate_sum(v_, out, g)

        res[impl]["adaln_x3"] = timed_chain(
            adaln_only, x, 8, "AdaLN x3 (mod+ssn+gate)")
        parts = (res[impl]["self_attention"] + res[impl]["cross_attention"]
                 + res[impl]["feed_forward"] + res[impl]["adaln_x3"])
        print(f"  {'sum of parts':<28s} {parts * 1e3:7.2f} ms "
              f"(block {res[impl]['block'] * 1e3:.2f}; "
              f"residual {(res[impl]['block'] - parts) * 1e3:+.2f})",
              flush=True)
    print(f"\nNFE check: 32 x block = "
          f"{32 * res['flash_int8']['block']:.2f} s int8 / "
          f"{32 * res['auto']['block']:.2f} s bf16 "
          f"(headline measured 6.26 / 7.27 s/NFE)", flush=True)
    return res


if __name__ == "__main__":
    main()
