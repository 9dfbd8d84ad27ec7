"""Fused feed-forward Pallas kernel (ops/ff_pallas.py) — interpret-mode
parity vs the XLA chain, row-padding edge, routing, and the Megatron
shard_map decomposition on the virtual mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from kandinsky5_tpu.models.nn import _sharded_fused_ff, feed_forward
from kandinsky5_tpu.ops.ff_pallas import _pick_bf, ff_supported, fused_ff

BF = jnp.bfloat16


def _xla_ff(x, w1, w2):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(BF)
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(BF)


def _inputs(key, rows, d, ff):
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (rows, d), BF)
    w1 = jax.random.normal(ks[1], (d, ff), BF) * 0.05
    w2 = jax.random.normal(ks[2], (ff, d), BF) * 0.05
    return x, w1, w2


def _assert_close(a, b, tol=0.02):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(np.max(np.abs(b)), 1e-6)
    assert np.max(np.abs(a - b)) / scale < tol


def test_fused_ff_interpret_matches_xla():
    # ff=2304 -> bf=1152: exercises the multi-chunk fp32 accumulator
    assert _pick_bf(2304) == 1152
    x, w1, w2 = _inputs(jax.random.PRNGKey(0), 1024, 256, 2304)
    out = fused_ff(x, w1, w2, interpret=True)
    _assert_close(out, _xla_ff(x, w1, w2))


def test_fused_ff_row_padding():
    # 600 rows pad to 1024; pad rows must not leak into real outputs
    x, w1, w2 = _inputs(jax.random.PRNGKey(1), 600, 256, 1024)
    out = fused_ff(x, w1, w2, interpret=True)
    assert out.shape == (600, 256)
    _assert_close(out, _xla_ff(x, w1, w2))


def test_fused_ff_leading_dims():
    x, w1, w2 = _inputs(jax.random.PRNGKey(2), 1024, 256, 1024)
    xb = x.reshape(2, 512, 256)
    out = fused_ff(xb, w1, w2, interpret=True)
    assert out.shape == (2, 512, 256)
    _assert_close(out.reshape(1024, 256), _xla_ff(x, w1, w2))


def test_ff_supported_gates():
    x, w1, w2 = _inputs(jax.random.PRNGKey(3), 1024, 256, 1024)
    assert ff_supported(x, w1, w2)
    # small row counts (text blocks, test shapes) stay on XLA
    assert not ff_supported(x[:128], w1, w2)
    # fp32 input stays on XLA
    assert not ff_supported(x.astype(jnp.float32), w1, w2)
    # odd dims stay on XLA
    assert not ff_supported(
        jnp.zeros((1024, 100), BF), jnp.zeros((100, 1024), BF),
        jnp.zeros((1024, 100), BF))


def test_feed_forward_routes_fused(monkeypatch):
    """flag=force routes through the kernel off-TPU (interpret); the
    result matches the flag=0 XLA path at bf16 tolerance."""
    x, w1, w2 = _inputs(jax.random.PRNGKey(4), 512, 256, 1024)
    p = {"in_layer": {"weight": w1}, "out_layer": {"weight": w2}}
    xb = x[None]
    monkeypatch.setenv("KANDINSKY5_TPU_FUSED_FF", "0")
    ref = feed_forward(p, xb)
    monkeypatch.setenv("KANDINSKY5_TPU_FUSED_FF", "force")
    out = feed_forward(p, xb)
    _assert_close(out, ref)


def test_fused_ff_modulated_interpret_matches_composition():
    """ssn -> FF -> gate+residual fused in-kernel == the XLA
    composition (apply_scale_shift_norm / feed_forward /
    apply_gate_sum) at bf16 tolerance, including the padded-rows path."""
    from kandinsky5_tpu.models.nn import (apply_gate_sum,
                                          apply_scale_shift_norm)
    from kandinsky5_tpu.ops.ff_pallas import fused_ff_modulated

    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    b, l, d, ff = 2, 600, 256, 1024
    x = jax.random.normal(ks[0], (b, l, d), BF)
    w1 = jax.random.normal(ks[1], (d, ff), BF) * 0.05
    w2 = jax.random.normal(ks[2], (ff, d), BF) * 0.05
    scale = jax.random.normal(ks[3], (b, 1, d), jnp.float32) * 0.1
    shift = jax.random.normal(ks[4], (b, 1, d), jnp.float32) * 0.1
    gate = jax.random.normal(ks[5], (b, 1, d), jnp.float32)

    xn = apply_scale_shift_norm(x, scale, shift)
    h = jnp.dot(xn, w1, preferred_element_type=jnp.float32).astype(BF)
    h = jax.nn.gelu(h, approximate=False)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(BF)
    ref = apply_gate_sum(x, y, gate)

    out = fused_ff_modulated(x, scale[:, 0], shift[:, 0], w1, w2,
                             gate[:, 0], interpret=True)
    assert out.shape == ref.shape
    _assert_close(out, ref)

    # use_gate=False returns the bare FF of the normed input (mesh path)
    out_ng = fused_ff_modulated(x, scale[:, 0], shift[:, 0], w1, w2,
                                use_gate=False, interpret=True)
    _assert_close(out_ng, y)


def test_modulated_feed_forward_routes(monkeypatch):
    from kandinsky5_tpu.models.nn import modulated_feed_forward

    ks = jax.random.split(jax.random.PRNGKey(8), 6)
    b, l, d, ff = 1, 512, 256, 1024
    x = jax.random.normal(ks[0], (b, l, d), BF)
    p = {"in_layer": {"weight": jax.random.normal(ks[1], (d, ff), BF) * 0.05},
         "out_layer": {"weight": jax.random.normal(ks[2], (ff, d), BF) * 0.05}}
    scale = jax.random.normal(ks[3], (b, 1, d), jnp.float32) * 0.1
    shift = jax.random.normal(ks[4], (b, 1, d), jnp.float32) * 0.1
    gate = jax.random.normal(ks[5], (b, 1, d), jnp.float32)
    monkeypatch.setenv("KANDINSKY5_TPU_FUSED_FF", "0")
    ref = modulated_feed_forward(p, x, scale, shift, gate)
    monkeypatch.setenv("KANDINSKY5_TPU_FUSED_FF", "force")
    out = modulated_feed_forward(p, x, scale, shift, gate)
    _assert_close(out, ref)


def test_sharded_fused_ff_matches_single_device():
    """Megatron decomposition (col-parallel W1, row-parallel W2, psum
    over tp) on the virtual mesh == single-device kernel output."""
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, axis_names=("dp", "sp", "tp"))
    x, w1, w2 = _inputs(jax.random.PRNGKey(5), 4096, 256, 1024)
    xb = x.reshape(2, 2048, 256)
    out = _sharded_fused_ff(xb, w1, w2, mesh)
    assert out is not None
    ref = fused_ff(xb, w1, w2, interpret=True)
    _assert_close(out, ref, tol=0.005)


def test_sharded_fused_ff_declines_indivisible():
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, axis_names=("dp", "sp", "tp"))
    x, w1, w2 = _inputs(jax.random.PRNGKey(6), 2048, 256, 300)
    assert _sharded_fused_ff(x[None], w1, w2, mesh) is None
