"""W8A8 linear path: numeric bound + full-model plumbing.

The int8 GEMM path (models/nn.py:_linear_i8) is an inference-only
opt-in; these tests bound its error on CPU (the XLA s8 dot is
backend-generic) and prove the quantized tree runs through the scanned
DiT forward unchanged."""

import numpy as np

import jax
import jax.numpy as jnp

from kandinsky5_tpu.models.nn import linear, quantize_linear


def test_linear_int8_error_bound():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    p = {"weight": jax.random.normal(ks[0], (256, 128)) * 0.05,
         "bias": jax.random.normal(ks[1], (128,)) * 0.1}
    x = jax.random.normal(ks[2], (4, 64, 256))
    y = np.asarray(linear(p, x), np.float32)
    y8 = np.asarray(linear(quantize_linear(p), x), np.float32)
    # per-token + per-channel symmetric int8: ~1% relative error
    denom = np.abs(y).max()
    assert np.abs(y8 - y).max() / denom < 0.02


def test_linear_int8_stacked_blocks():
    """Leading stacked-block axes quantize in one call and slice
    correctly (the lax.scan layout of the DiT blocks)."""
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    p = {"weight": jax.random.normal(ks[0], (3, 64, 32)) * 0.05}
    q = quantize_linear(p)
    assert q["weight_i8"].shape == (3, 64, 32)
    assert q["w_scale"].shape == (3, 32)
    x = jax.random.normal(ks[1], (2, 16, 64))
    for i in range(3):
        y = np.asarray(linear({"weight": p["weight"][i]}, x), np.float32)
        y8 = np.asarray(linear(
            {"weight_i8": q["weight_i8"][i], "w_scale": q["w_scale"][i]},
            x), np.float32)
        assert np.abs(y8 - y).max() / np.abs(y).max() < 0.02


def test_quantized_shard_matches_single_device():
    """W8A8 tree under TP (spec-adapted shardings) == single-device
    W8A8 forward: the int32 partial sums are exact, so the sharded
    path must agree to f32 roundoff."""
    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import (
        dit_forward,
        init_dit_params,
        quantize_dit_params,
    )
    from kandinsky5_tpu.parallel.sharding import (
        make_mesh,
        shard_dit_params,
        sharding_ctx,
    )

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs the virtual multi-device CPU mesh")

    cfg = DiTParams(in_visual_dim=4, out_visual_dim=4, in_text_dim=32,
                    in_text_dim2=16, time_dim=32, model_dim=128, ff_dim=256,
                    num_text_blocks=1, num_visual_blocks=2,
                    axes_dims=(8, 4, 4), visual_cond=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    q = quantize_dit_params(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 8, 8, 4), jnp.float32)
    text = jnp.asarray(rng.randn(1, 8, cfg.in_text_dim), jnp.float32)
    pooled = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32)
    t = jnp.full((1,), 400.0, jnp.float32)
    mask = jnp.ones((1, 8), bool)

    ref = np.asarray(dit_forward(q, cfg, x, text, pooled, t, mask),
                     np.float32)
    mesh = make_mesh(4)  # (dp=1, sp=1, tp=4)
    q_sharded = shard_dit_params(q, mesh)
    with sharding_ctx(mesh):
        got = np.asarray(
            jax.jit(dit_forward, static_argnums=(1,))(
                q_sharded, cfg, x, text, pooled, t, mask), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_quantized_dit_forward_close():
    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import (
        dit_forward,
        init_dit_params,
        quantize_dit_params,
    )

    cfg = DiTParams(in_visual_dim=4, out_visual_dim=4, time_dim=32,
                    model_dim=64, ff_dim=128, num_visual_blocks=2,
                    num_text_blocks=1, axes_dims=(8, 4, 4),
                    visual_cond=False, in_text_dim=48, in_text_dim2=24)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 3, 8, 8, 4), jnp.float32)
    text = jnp.asarray(rng.randn(1, 16, cfg.in_text_dim), jnp.float32)
    pooled = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32)
    t = jnp.full((1,), 400.0, jnp.float32)
    mask = jnp.ones((1, 16), bool)

    ref = np.asarray(dit_forward(params, cfg, x, text, pooled, t, mask),
                     np.float32)
    q = quantize_dit_params(params)
    got = np.asarray(dit_forward(q, cfg, x, text, pooled, t, mask),
                     np.float32)
    denom = max(float(np.abs(ref).max()), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.05
