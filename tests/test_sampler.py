"""End-to-end denoise parity vs the reference Euler loop on CPU, plus
MagCache schedule unit tests."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky5_tpu.checkpoint import convert_dit_state_dict
from kandinsky5_tpu.config import DiTParams, MagCacheConfig
from kandinsky5_tpu.sampling import (
    DenoiseSpec,
    generate_latents,
    magcache_schedule,
    timestep_grid,
)

from .ref import TINY, TINY_COND, load_reference_models, torch_state_to_numpy
from .test_dit_parity import _to_cfg


def _ns(d):
    if isinstance(d, dict):
        return types.SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _ref_generate(tiny, *, shape, steps, w, scheduler_scale, seed,
                  attention=None, text_len=5):
    """Run the reference generate() (generation_utils.py:80-129) on CPU."""
    _, rdit, _ = load_reference_models()
    import kandinsky.generation_utils as rgen
    torch.manual_seed(7)
    ref = rdit.get_dit(dict(tiny))
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "modulation" in name:
                p.copy_(torch.randn_like(p) * 0.02)

    attention = attention or {"type": "flash"}
    conf = _ns({
        "model": {"dit_params": {"patch_size": tiny["patch_size"]},
                  "attention": attention},
        "metrics": {"scale_factor": (1.0, 2.0, 2.0)},
    })

    rng = np.random.RandomState(11)
    text = rng.randn(text_len, tiny["in_text_dim"]).astype(np.float32)
    null_text = rng.randn(3, tiny["in_text_dim"]).astype(np.float32)
    pooled = rng.randn(1, tiny["in_text_dim2"]).astype(np.float32)
    null_pooled = rng.randn(1, tiny["in_text_dim2"]).astype(np.float32)

    embeds = {"text_embeds": torch.from_numpy(text),
              "pooled_embed": torch.from_numpy(pooled)}
    null_embeds = {"text_embeds": torch.from_numpy(null_text),
                   "pooled_embed": torch.from_numpy(null_pooled)}

    T, H, W, C = shape
    visual_rope_pos = [torch.arange(T), torch.arange(H // 2), torch.arange(W // 2)]

    # the reference hardcodes a CUDA Generator (generation_utils.py:97);
    # substitute CPU
    real_gen = torch.Generator
    torch.Generator = lambda device=None: real_gen("cpu")
    try:
        with torch.no_grad():
            out = rgen.generate(
                ref, "cpu", shape, steps, embeds, null_embeds,
                visual_rope_pos, torch.arange(text_len), torch.arange(3),
                w, scheduler_scale, conf, seed=seed,
            )
    finally:
        torch.Generator = real_gen

    g = real_gen("cpu")
    g.manual_seed(seed)
    noise = torch.randn(*shape, generator=g)
    inputs = dict(
        text=text, null_text=null_text, pooled=pooled, null_pooled=null_pooled,
        noise=noise.numpy(),
    )
    return ref, out.numpy(), inputs


def _run_mine(ref, tiny, inputs, *, shape, steps, w, scheduler_scale,
              attention_type="flash", magcache=None):
    cfg = _to_cfg(tiny)
    params = convert_dit_state_dict(torch_state_to_numpy(ref), cfg, dtype=jnp.float32)
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=steps, guidance_weight=w,
        scheduler_scale=scheduler_scale, scale_factor=(1.0, 2.0, 2.0),
        attention_type=attention_type, nabla_P=0.9, nabla_wT=3, nabla_wH=3,
        nabla_wW=3, attn_impl="dense" if attention_type == "flash" else "xla",
    )
    lt, lh, lw = inputs["text"].shape[0], inputs["null_text"].shape[0], None
    cond = {
        "text_embeds": jnp.asarray(inputs["text"])[None],
        "pooled_embed": jnp.asarray(inputs["pooled"]),
        "mask": jnp.ones((1, inputs["text"].shape[0]), bool),
    }
    uncond = {
        "text_embeds": jnp.asarray(inputs["null_text"])[None],
        "pooled_embed": jnp.asarray(inputs["null_pooled"]),
        "mask": jnp.ones((1, inputs["null_text"].shape[0]), bool),
    }
    # pad text to common length for the batched CFG call
    lmax = max(cond["text_embeds"].shape[1], uncond["text_embeds"].shape[1])

    def pad(d):
        te = d["text_embeds"]
        m = d["mask"]
        if te.shape[1] < lmax:
            pad_n = lmax - te.shape[1]
            te = jnp.pad(te, ((0, 0), (0, pad_n), (0, 0)))
            m = jnp.pad(m, ((0, 0), (0, pad_n)))
        return {**d, "text_embeds": te, "mask": m}

    cond, uncond = pad(cond), pad(uncond)
    out = generate_latents(
        params, spec, (1, *shape), cond, uncond, seed=0,
        magcache=magcache, noise=jnp.asarray(inputs["noise"])[None],
    )
    return np.asarray(out[0])


def test_timestep_grid_matches_reference():
    for steps, s in [(4, 1.0), (16, 5.0), (50, 10.0)]:
        t = torch.linspace(1, 0, steps + 1)
        t = s * t / (1 + (s - 1) * t)
        np.testing.assert_allclose(timestep_grid(steps, s), t.numpy(),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "tiny,w", [(TINY, 3.5), (TINY_COND, 3.5), (TINY, 1.0)],
    ids=["cfg", "cfg_visual_cond", "nocfg"],
)
def test_denoise_matches_reference(tiny, w):
    shape = (2, 8, 8, tiny["in_visual_dim"])
    steps = 3
    ref, ref_out, inputs = _ref_generate(
        tiny, shape=shape, steps=steps, w=w, scheduler_scale=5.0, seed=42)
    mine = _run_mine(ref, tiny, inputs, shape=shape, steps=steps, w=w,
                     scheduler_scale=5.0)
    np.testing.assert_allclose(mine, ref_out, rtol=1e-3, atol=1e-3)


def test_denoise_nabla_matches_reference():
    """Full NABLA path (fractal reorder + adaptive block mask) vs the
    reference flex_attention execution."""
    tiny = dict(TINY, num_visual_blocks=2)
    shape = (2, 32, 48, tiny["in_visual_dim"])  # token grid (2,16,24) -> S=768
    steps = 2
    attention = {"type": "nabla", "P": 0.9, "wT": 3, "wH": 3, "wW": 3,
                 "add_sta": True, "method": "topcdf"}
    ref, ref_out, inputs = _ref_generate(
        tiny, shape=shape, steps=steps, w=1.0, scheduler_scale=1.0, seed=13,
        attention=attention)
    mine = _run_mine(ref, tiny, inputs, shape=shape, steps=steps, w=1.0,
                     scheduler_scale=1.0, attention_type="nabla")
    np.testing.assert_allclose(mine, ref_out, rtol=2e-3, atol=2e-3)


def test_magcache_schedule_properties():
    mag = MagCacheConfig(mag_ratios=tuple(1.0 + 0.001 * i for i in range(98)))
    steps = 50
    skip = magcache_schedule(mag, steps, no_cfg=False)
    assert skip.shape == (steps, 2)
    warmup_steps = int(steps * 2 * mag.retention_ratio) // 2
    assert not skip[:warmup_steps].any()  # warmup never skips
    # never more than K consecutive skips per branch
    for b in range(2):
        run = 0
        for s in skip[:, b]:
            run = run + 1 if s else 0
            assert run <= mag.K
    assert skip.any()  # ratios near 1.0 must produce some skips

    skip_nocfg = magcache_schedule(mag, steps, no_cfg=True)
    assert not skip_nocfg[:, 1].any()


def test_magcache_interpolation():
    """16-step distil config with 98-entry ratio table must interpolate
    (reference magcache_utils.py:30-37)."""
    mag = MagCacheConfig(mag_ratios=tuple(np.linspace(0.9, 1.1, 96)))
    skip = magcache_schedule(mag, 16, no_cfg=True)
    assert skip.shape == (16, 2)


def test_fused_scan_progress(capsys):
    """progress=True reports per-step by driving the schedule as
    length-1 denoise_span chunks (reference tqdm,
    generation_utils.py:105) without changing the result bit-for-bit
    vs the fused scan."""
    from kandinsky5_tpu.models.dit import init_dit_params

    cfg = DiTParams(
        in_visual_dim=4, out_visual_dim=4, in_text_dim=16, in_text_dim2=8,
        time_dim=16, patch_size=(1, 2, 2), model_dim=32, ff_dim=64,
        num_text_blocks=1, num_visual_blocks=2, axes_dims=(8, 4, 4),
        visual_cond=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    spec = DenoiseSpec(dit_params=cfg, num_steps=4, guidance_weight=2.0,
                       scheduler_scale=5.0, scale_factor=(1.0, 1.0, 1.0))
    cond = {"text_embeds": jnp.zeros((1, 4, 16)),
            "pooled_embed": jnp.zeros((1, 8)),
            "mask": jnp.ones((1, 4), bool)}
    out = generate_latents(params, spec, (1, 2, 8, 8, 4), cond, cond,
                           seed=0, progress=True)
    out.block_until_ready()
    captured = capsys.readouterr().out
    assert "denoise step 1/4" in captured
    assert "denoise step 4/4" in captured
    out_silent = generate_latents(params, spec, (1, 2, 8, 8, 4), cond, cond,
                                  seed=0)
    assert (np.asarray(out) == np.asarray(out_silent)).all()
    assert "denoise step" not in capsys.readouterr().out
