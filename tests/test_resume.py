"""Preemption-safe chunked generation (utils/resume.py).

The chunked path must be bit-identical to the single-scan denoise
(the chunk boundary threads the exact scan carry), and an interrupted
run must resume from disk and land on the same latents.
"""

import numpy as np

import jax
import jax.numpy as jnp

from kandinsky5_tpu.config import DiTParams, MagCacheConfig
from kandinsky5_tpu.models.dit import init_dit_params
from kandinsky5_tpu.sampling import DenoiseSpec, generate_latents
from kandinsky5_tpu.utils.resume import load_state, resumable_generate


def _setup():
    cfg = DiTParams(
        in_visual_dim=4, out_visual_dim=4, in_text_dim=32, in_text_dim2=16,
        time_dim=32, patch_size=(1, 2, 2), model_dim=128, ff_dim=256,
        num_text_blocks=1, num_visual_blocks=2, axes_dims=(8, 4, 4),
        visual_cond=False,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    for blocks, mod in (("text_transformer_blocks", "text_modulation"),
                        ("visual_transformer_blocks", "visual_modulation")):
        w = params[blocks][mod]["out_layer"]["weight"]
        params[blocks][mod]["out_layer"]["weight"] = (
            jax.random.normal(jax.random.PRNGKey(7), w.shape, w.dtype) * 0.05)
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=6, guidance_weight=5.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0), attn_impl="dense")
    rng = np.random.RandomState(0)
    L = 8
    cond = dict(
        text_embeds=jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.float32),
        pooled_embed=jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32),
        mask=jnp.ones((1, L), bool))
    uncond = dict(
        text_embeds=jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.float32),
        pooled_embed=jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32),
        mask=jnp.ones((1, L), bool))
    mag = MagCacheConfig(mag_ratios=tuple(
        1.0 + 0.02 * np.sin(np.arange(12))), threshold=0.05, K=2,
        retention_ratio=0.25)
    return cfg, params, spec, cond, uncond, mag


def test_chunked_matches_single_scan(tmp_path):
    _, params, spec, cond, uncond, mag = _setup()
    shape = (1, 2, 8, 8, 4)
    base = generate_latents(params, spec, shape, cond, uncond, seed=7,
                            magcache=mag)
    path = str(tmp_path / "gen.npz")
    out = resumable_generate(params, spec, shape, cond, uncond, seed=7,
                             checkpoint_path=path, magcache=mag, chunk=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    assert not (tmp_path / "gen.npz").exists()  # cleaned up on success


def test_interrupted_run_resumes(tmp_path):
    _, params, spec, cond, uncond, mag = _setup()
    shape = (1, 2, 8, 8, 4)
    base = generate_latents(params, spec, shape, cond, uncond, seed=3,
                            magcache=mag)
    path = str(tmp_path / "gen.npz")
    # simulate preemption after 1 chunk (2 of 6 steps)
    out = resumable_generate(params, spec, shape, cond, uncond, seed=3,
                             checkpoint_path=path, magcache=mag, chunk=2,
                             _stop_after_chunks=1)
    assert out is None
    st = load_state(path, fingerprint=_fp(spec, shape, 3, cond, uncond))
    assert st is not None and st[0] == 2
    # relaunch: resumes at step 2 and completes
    out = resumable_generate(params, spec, shape, cond, uncond, seed=3,
                             checkpoint_path=path, magcache=mag, chunk=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_fingerprint_mismatch_restarts(tmp_path):
    _, params, spec, cond, uncond, _ = _setup()
    shape = (1, 2, 8, 8, 4)
    path = str(tmp_path / "gen.npz")
    resumable_generate(params, spec, shape, cond, uncond, seed=3,
                       checkpoint_path=path, chunk=2, _stop_after_chunks=1)
    # a different seed must NOT resume from this state
    assert load_state(path,
                      fingerprint=_fp(spec, shape, 4, cond, uncond)) is None


def _fp(spec, shape, seed, cond, uncond=None):
    from kandinsky5_tpu.utils.resume import _fingerprint

    return _fingerprint(spec, shape, seed, cond, uncond)
