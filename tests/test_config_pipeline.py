"""Config loading for all eight released YAMLs + pipeline plumbing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky5_tpu.config import Config, DiTParams, load_config
from kandinsky5_tpu.pipeline import Kandinsky5T2VPipeline
from kandinsky5_tpu.sampling import DenoiseSpec, magcache_schedule

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "kandinsky5_tpu",
                          "configs")

ALL_CONFIGS = sorted(f for f in os.listdir(CONFIG_DIR) if f.endswith(".yaml"))


def test_eight_configs_present():
    assert len(ALL_CONFIGS) == 8
    for variant in ("pretrain", "sft", "nocfg", "distil"):
        assert sum(variant in c for c in ALL_CONFIGS) == 2  # 5s + 10s


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_loads(name):
    conf = load_config(os.path.join(CONFIG_DIR, name))
    d = conf.model.dit_params
    # released 2B architecture (reference configs/*.yaml dit_params)
    assert d.model_dim == 1792 and d.ff_dim == 7168
    assert d.num_visual_blocks == 32 and d.num_text_blocks == 2
    assert d.head_dim == 64 and d.num_heads == 28
    assert d.visual_cond and d.visual_embed_dim == 33
    assert conf.metrics.scale_factor == (1.0, 2.0, 2.0)

    if "distil" in name:
        assert conf.model.num_steps == 16
        assert conf.model.guidance_weight == 1.0
    elif "nocfg" in name:
        assert conf.model.num_steps == 50
        assert conf.model.guidance_weight == 1.0
    else:
        assert conf.model.num_steps == 50
        assert conf.model.guidance_weight == 5.0

    if "10s" in name:
        assert conf.model.attention.type == "nabla"
        assert conf.model.attention.P == 0.9
        assert conf.model.attention.wT == 11
        assert conf.model.attention.add_sta
    else:
        assert conf.model.attention.type == "flash"

    if "sft" in name or "nocfg" in name:
        assert conf.magcache is not None
        assert len(conf.magcache.mag_ratios) == 98
        skip = magcache_schedule(conf.magcache, conf.model.num_steps,
                                 no_cfg="nocfg" in name)
        assert skip.any()


@pytest.mark.parametrize("name", ["config_5s_sft.yaml", "config_10s_distil.yaml"])
def test_denoise_spec_from_config(name):
    conf = load_config(os.path.join(CONFIG_DIR, name))
    pipe = Kandinsky5T2VPipeline(dit_params=None, conf=conf)
    spec = pipe._spec(conf.model.num_steps, conf.model.guidance_weight, 5.0)
    assert isinstance(spec, DenoiseSpec)
    assert spec.use_cfg == (conf.model.guidance_weight != 1.0)
    assert (spec.attention_type == "nabla") == ("10s" in name)
    hash(spec)  # must be hashable (jit static arg)


def test_frame_count_rule():
    """num_frames = 1 if t==0 else t*24//4+1 (reference t2v_pipeline.py:128)."""
    for t, expected in [(0, 1), (5, 31), (10, 61)]:
        num_frames = 1 if t == 0 else t * 24 // 4 + 1
        assert num_frames == expected


def test_resolution_validation():
    conf = load_config(os.path.join(CONFIG_DIR, "config_5s_sft.yaml"))
    pipe = Kandinsky5T2VPipeline(dit_params=None, conf=conf)
    with pytest.raises(ValueError, match="height, width"):
        pipe("x", width=768, height=768, expand_prompts=False)
