"""MagCache golden parity: the host-precomputed skip schedule +
carried-residual denoise must reproduce the reference's monkey-patched
``magcache_forward`` (/root/reference/kandinsky/magcache_utils.py:40-101)
bit-for-bit in skip decisions and within float tolerance in outputs.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from kandinsky5_tpu.config import MagCacheConfig
from kandinsky5_tpu.sampling import magcache_schedule

from .ref import TINY, load_reference_models
from .test_sampler import _run_mine


def _ref_with_magcache(tiny, *, shape, steps, w, ratios, seed):
    """Like test_sampler._ref_generate but with MagCache installed on the
    generated model instance (state lives on the instance, the patched
    forward on the class)."""
    _, rdit, _ = load_reference_models()
    import kandinsky.generation_utils as rgen
    import kandinsky.magcache_utils as rmag

    cls = rdit.DiffusionTransformer3D
    orig_forward = cls.forward
    torch.manual_seed(7)
    ref = rdit.get_dit(dict(tiny))
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "modulation" in name:
                p.copy_(torch.randn_like(p) * 0.02)
    rmag.set_magcache_params(ref, list(ratios), steps,
                             no_cfg=abs(w - 1.0) <= 1e-6)

    import types

    def _ns(d):
        if isinstance(d, dict):
            return types.SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
        return d

    conf = _ns({
        "model": {"dit_params": {"patch_size": tiny["patch_size"]},
                  "attention": {"type": "flash"}},
        "metrics": {"scale_factor": (1.0, 2.0, 2.0)},
    })
    rng = np.random.RandomState(11)
    text_len = 5
    text = rng.randn(text_len, tiny["in_text_dim"]).astype(np.float32)
    null_text = rng.randn(3, tiny["in_text_dim"]).astype(np.float32)
    pooled = rng.randn(1, tiny["in_text_dim2"]).astype(np.float32)
    null_pooled = rng.randn(1, tiny["in_text_dim2"]).astype(np.float32)
    embeds = {"text_embeds": torch.from_numpy(text),
              "pooled_embed": torch.from_numpy(pooled)}
    null_embeds = {"text_embeds": torch.from_numpy(null_text),
                   "pooled_embed": torch.from_numpy(null_pooled)}
    T, H, W, C = shape
    visual_rope_pos = [torch.arange(T), torch.arange(H // 2),
                       torch.arange(W // 2)]
    real_gen = torch.Generator
    torch.Generator = lambda device=None: real_gen("cpu")
    try:
        with torch.no_grad():
            out = rgen.generate(
                ref, "cpu", shape, steps, embeds, null_embeds,
                visual_rope_pos, torch.arange(text_len), torch.arange(3),
                w, 5.0, conf, seed=seed)
    finally:
        torch.Generator = real_gen
        cls.forward = orig_forward

    g = real_gen("cpu")
    g.manual_seed(seed)
    noise = torch.randn(*shape, generator=g)
    inputs = dict(text=text, null_text=null_text, pooled=pooled,
                  null_pooled=null_pooled, noise=noise.numpy())
    return ref, out.numpy(), inputs


@pytest.mark.parametrize(
    "steps,w,n_ratios",
    [(10, 3.5, 20), (16, 1.0, 96)],
    ids=["cfg_exact_table", "nocfg_interpolated"],
)
def test_magcache_denoise_matches_reference(steps, w, n_ratios):
    # ratios straddling 1.0 so skips AND resets both occur
    ratios = tuple(float(r) for r in
                   1.0 + 0.004 * np.sin(np.arange(n_ratios)))
    mag = MagCacheConfig(mag_ratios=ratios)
    skip = magcache_schedule(mag, steps, no_cfg=abs(w - 1.0) <= 1e-6)
    assert skip.any(), "schedule produced no skips — test would be vacuous"

    tiny = dict(TINY)
    shape = (2, 8, 8, tiny["in_visual_dim"])
    ref, ref_out, inputs = _ref_with_magcache(
        tiny, shape=shape, steps=steps, w=w, ratios=ratios, seed=21)
    mine = _run_mine(ref, tiny, inputs, shape=shape, steps=steps, w=w,
                     scheduler_scale=5.0, magcache=mag)
    np.testing.assert_allclose(mine, ref_out, rtol=1e-3, atol=1e-3)


def test_magcache_schedule_matches_reference_counters():
    """Replay the reference counter chain step-for-step and compare the
    boolean skip decisions (magcache_utils.py:64-87)."""
    for steps, no_cfg, n in [(50, False, 100), (16, True, 96),
                             (50, False, 60), (7, True, 14)]:
        ratios = 1.0 + 0.01 * np.cos(np.arange(n))
        mag = MagCacheConfig(mag_ratios=tuple(ratios))
        mine = magcache_schedule(mag, steps, no_cfg=no_cfg)

        # reference chain
        table = np.array([1.0, 1.0] + list(ratios))
        total = steps * 2
        if len(table) != total:
            from kandinsky5_tpu.sampling import magcache_schedule as _  # noqa
            src_c, src_u = table[0::2], table[1::2]

            def near(src, tgt):
                if tgt == 1:
                    return np.array([src[-1]])
                sc = (len(src) - 1) / (tgt - 1)
                return src[np.round(np.arange(tgt) * sc).astype(int)]

            table = np.stack([near(src_c, steps), near(src_u, steps)],
                             axis=1).reshape(-1)
        acc_ratio, acc_steps, acc_err = [1.0, 1.0], [0, 0], [0.0, 0.0]
        ref = np.zeros((steps, 2), bool)
        calls = range(0, total, 2) if no_cfg else range(total)
        for cnt in calls:
            b = cnt % 2
            if cnt >= int(total * 0.2):
                acc_ratio[b] *= table[cnt]
                acc_steps[b] += 1
                acc_err[b] += abs(1 - acc_ratio[b])
                if acc_err[b] < 0.12 and acc_steps[b] <= 2:
                    ref[cnt // 2, b] = True
                else:
                    acc_ratio[b], acc_steps[b], acc_err[b] = 1.0, 0, 0.0
        np.testing.assert_array_equal(mine, ref)
