"""End-to-end pipeline smoke test on CPU with a stub text embedder and a
tiny DiT — exercises Kandinsky5T2VPipeline.__call__ through denoise,
VAE decode, uint8 conversion and file writing."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky5_tpu.config import (
    AttentionConfig,
    Config,
    DiTParams,
    MetricsConfig,
    ModelConfig,
)
from kandinsky5_tpu.models.dit import init_dit_params
from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params
from kandinsky5_tpu.pipeline import RESOLUTIONS, Kandinsky5T2VPipeline


class StubEmbedder:
    """Deterministic random embeddings; no tokenizer/weights needed."""

    def __init__(self, text_dim, pooled_dim, length=8):
        self.text_dim = text_dim
        self.pooled_dim = pooled_dim
        self.length = length

    def encode(self, texts, type_of_content="video"):
        from kandinsky5_tpu.text.embedder import TextEmbeddings

        rng = np.random.RandomState(abs(hash(texts[0])) % (2**31))
        return TextEmbeddings(
            text_embeds=jnp.asarray(
                rng.randn(len(texts), self.length, self.text_dim), jnp.float32),
            pooled_embed=jnp.asarray(
                rng.randn(len(texts), self.pooled_dim), jnp.float32),
            mask=jnp.ones((len(texts), self.length), bool),
        )

    def expand_prompt(self, prompt):
        return prompt + " (expanded)"


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = DiTParams(in_visual_dim=16, out_visual_dim=16, in_text_dim=32,
                    in_text_dim2=16, time_dim=32, model_dim=64, ff_dim=128,
                    num_text_blocks=1, num_visual_blocks=2,
                    axes_dims=(8, 4, 4), visual_cond=True)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    conf = Config(model=ModelConfig(dit_params=cfg, num_steps=2,
                                    guidance_weight=1.0,
                                    attention=AttentionConfig(type="flash")),
                  metrics=MetricsConfig())
    vae = HunyuanVideoVAE(init_vae_params(jax.random.PRNGKey(1),
                                          dtype=jnp.float32),
                          dtype=jnp.float32)
    return Kandinsky5T2VPipeline(
        dit_params=params, conf=conf,
        text_embedder=StubEmbedder(32, 16), vae=vae)


def test_pipeline_image_mode(tiny_pipe, tmp_path, monkeypatch):
    """time_length=0 -> one frame, saved as PNG. Patch the resolution
    table to a CPU-sized grid (the real 512x768 VAE decode is a TPU job)."""
    monkeypatch.setitem(RESOLUTIONS, 512, [(64, 64)])
    out = str(tmp_path / "image.png")
    frames = tiny_pipe("a test image", time_length=0, width=64, height=64,
                       seed=3, save_path=out, progress=False)
    assert frames.shape == (1, 1, 64, 64, 3)
    assert frames.dtype == np.uint8
    assert os.path.exists(out)


def test_pipeline_video_mode(tiny_pipe, tmp_path, monkeypatch):
    monkeypatch.setitem(RESOLUTIONS, 512, [(64, 64)])
    out = str(tmp_path / "clip.mp4")
    frames = tiny_pipe("a test video", time_length=1, width=64, height=64,
                       seed=3, save_path=out, progress=False)
    # 1s -> 1*24//4+1 = 7 latent frames -> 25 video frames
    assert frames.shape == (1, 25, 64, 64, 3)
    assert frames.dtype == np.uint8
    # encoder-less environment falls back to .y4m
    assert os.path.exists(out) or os.path.exists(str(tmp_path / "clip.y4m"))


def test_pipeline_expand_prompt(tiny_pipe):
    assert tiny_pipe.expand_prompt("hi").endswith("(expanded)")


def test_pipeline_checkpoint_path_resumable(tiny_pipe, tmp_path, monkeypatch):
    """checkpoint_path= routes through the resumable chunked denoise and
    produces the same frames as the plain path (same seed)."""
    monkeypatch.setitem(RESOLUTIONS, 512, [(64, 64)])
    plain = tiny_pipe("a video", time_length=0, width=64, height=64,
                      seed=11, progress=False, expand_prompts=False)
    ckpt = str(tmp_path / "gen_state.npz")
    resumed = tiny_pipe("a video", time_length=0, width=64, height=64,
                        seed=11, progress=False, expand_prompts=False,
                        checkpoint_path=ckpt)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(resumed))
    assert not os.path.exists(ckpt)  # cleaned up on completion
