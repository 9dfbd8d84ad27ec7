"""Multi-prompt batched denoise == independent single-prompt runs."""

import numpy as np

import jax
import jax.numpy as jnp

from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.dit import init_dit_params
from kandinsky5_tpu.sampling import DenoiseSpec, generate_latents


def _cond(rng, b, l, cfg):
    return {"text_embeds": jnp.asarray(rng.randn(b, l, cfg.in_text_dim),
                                       jnp.float32),
            "pooled_embed": jnp.asarray(rng.randn(b, cfg.in_text_dim2),
                                        jnp.float32),
            "mask": jnp.ones((b, l), bool)}


def test_batched_cfg_denoise_matches_singles():
    cfg = DiTParams(in_visual_dim=4, out_visual_dim=4, in_text_dim=24,
                    in_text_dim2=12, time_dim=32, model_dim=64, ff_dim=128,
                    num_text_blocks=1, num_visual_blocks=2,
                    axes_dims=(8, 4, 4), visual_cond=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spec = DenoiseSpec(dit_params=cfg, num_steps=2, guidance_weight=3.0,
                       scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
                       attn_impl="dense")
    rng = np.random.RandomState(0)
    B, L = 2, 6
    cond = _cond(rng, B, L, cfg)
    uncond = _cond(rng, B, L, cfg)
    noise = jnp.asarray(rng.randn(B, 2, 8, 8, 4), jnp.float32)

    batched = generate_latents(params, spec, noise.shape, cond, uncond,
                               seed=0, noise=noise)
    for i in range(B):
        single = generate_latents(
            params, spec, (1, 2, 8, 8, 4),
            {k: v[i:i + 1] for k, v in cond.items()},
            {k: v[i:i + 1] for k, v in uncond.items()},
            seed=0, noise=noise[i:i + 1])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single[0]),
                                   rtol=2e-4, atol=2e-4)


def test_sequential_cfg_matches_batched():
    """sequential_cfg=True (memory fallback) must match the batched pair."""
    import dataclasses

    cfg = DiTParams(in_visual_dim=4, out_visual_dim=4, in_text_dim=24,
                    in_text_dim2=12, time_dim=32, model_dim=64, ff_dim=128,
                    num_text_blocks=1, num_visual_blocks=2,
                    axes_dims=(8, 4, 4), visual_cond=False)
    params = init_dit_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    spec = DenoiseSpec(dit_params=cfg, num_steps=2, guidance_weight=4.0,
                       scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
                       attn_impl="dense")
    rng = np.random.RandomState(7)
    cond = _cond(rng, 1, 5, cfg)
    uncond = _cond(rng, 1, 5, cfg)
    noise = jnp.asarray(rng.randn(1, 2, 8, 8, 4), jnp.float32)
    a = generate_latents(params, spec, noise.shape, cond, uncond, seed=0,
                         noise=noise)
    spec_seq = dataclasses.replace(spec, sequential_cfg=True)
    b = generate_latents(params, spec_seq, noise.shape, cond, uncond, seed=0,
                         noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_host_loop_matches_scan():
    cfg = DiTParams(in_visual_dim=4, out_visual_dim=4, in_text_dim=24,
                    in_text_dim2=12, time_dim=32, model_dim=64, ff_dim=128,
                    num_text_blocks=1, num_visual_blocks=2,
                    axes_dims=(8, 4, 4), visual_cond=False)
    params = init_dit_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    spec = DenoiseSpec(dit_params=cfg, num_steps=3, guidance_weight=4.0,
                       scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
                       attn_impl="dense")
    rng = np.random.RandomState(11)
    cond = _cond(rng, 1, 5, cfg)
    uncond = _cond(rng, 1, 5, cfg)
    noise = jnp.asarray(rng.randn(1, 2, 8, 8, 4), jnp.float32)
    a = generate_latents(params, spec, noise.shape, cond, uncond, seed=0,
                         noise=noise)
    b = generate_latents(params, spec, noise.shape, cond, uncond, seed=0,
                         noise=noise, host_loop=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
