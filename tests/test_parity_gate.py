"""The fidelity gate (tools/parity_check.py) must measure the FAITHFUL
paths: bf16 flash attention + tiled VAE decode — not the single-chip
fast defaults (int8-QK + streaming decode), whose deltas are secondary
numbers (VERDICT r3 weak #3; BASELINE.md gates PSNR vs the PyTorch
reference, which decodes tiled — reference vae.py:1144-1204)."""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.sampling import DenoiseSpec


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "parity_check.py")
    spec = importlib.util.spec_from_file_location("k5_parity_check", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_faithful_spec_pins_bf16_and_preserves_the_rest():
    pc = _load_tool()
    cfg = DiTParams(model_dim=64, ff_dim=128, num_visual_blocks=2,
                    time_dim=32)
    fast = DenoiseSpec(dit_params=cfg, num_steps=7, guidance_weight=3.5,
                       scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
                       attention_type="nabla", attn_impl="flash_int8",
                       sequential_cfg=True)
    faithful = pc.faithful_spec(fast)
    assert faithful.attn_impl == "auto"
    # everything else must be untouched — the gate changes numerics of
    # the kernel only, not the sampling semantics
    assert faithful.num_steps == fast.num_steps
    assert faithful.guidance_weight == fast.guidance_weight
    assert faithful.attention_type == fast.attention_type
    assert faithful.sequential_cfg == fast.sequential_cfg


def test_gate_decode_mode_is_tiled():
    pc = _load_tool()
    assert pc.GATE_DECODE_MODE == "tiled"


class _RecordingPipe:
    """Stub pipeline: tiny real denoise, recording decode modes."""

    class _Emb:
        def __init__(self, cfg, L=6):
            self.cfg = cfg
            self.L = L

        def encode(self, texts, type_of_content="video"):
            import types

            rng = np.random.RandomState(len(texts[0]) % 97)
            cfg = self.cfg
            return types.SimpleNamespace(
                text_embeds=jnp.asarray(
                    rng.randn(1, self.L, cfg.in_text_dim), jnp.float32),
                pooled_embed=jnp.asarray(
                    rng.randn(1, cfg.in_text_dim2), jnp.float32),
                mask=jnp.ones((1, self.L), bool))

    class _Vae:
        def default_decode_mode(self):
            return "stream"  # the single-chip fast default

    def __init__(self):
        import types

        import jax

        from kandinsky5_tpu.models.dit import init_dit_params

        self.cfg = DiTParams(model_dim=64, ff_dim=128,
                             num_visual_blocks=2, time_dim=32)
        self.dit_params = init_dit_params(jax.random.PRNGKey(0), self.cfg,
                                          dtype=jnp.float32)
        self.text_embedder = self._Emb(self.cfg)
        self.vae = self._Vae()
        self.conf = types.SimpleNamespace(model=types.SimpleNamespace(
            num_steps=2, guidance_weight=1.0))
        self.decode_modes = []

    def _spec(self, num_steps, guidance_weight, scheduler_scale):
        # a deviating default that still runs on CPU (the production
        # single-chip default is flash_int8 — Pallas, TPU-only)
        return DenoiseSpec(
            dit_params=self.cfg, num_steps=num_steps,
            guidance_weight=guidance_weight,
            scheduler_scale=scheduler_scale,
            scale_factor=(1.0, 2.0, 2.0),
            attn_impl="dense")

    def decode_latents(self, latents, mode=None):
        self.decode_modes.append(mode)
        # deterministic fake frames so PSNR is computable
        x = np.asarray(latents.astype(jnp.float32))
        frames = np.clip((x[..., :3] * 20 + 127), 0, 255).astype(np.uint8)
        return frames


def test_run_ours_gates_through_faithful_paths():
    pc = _load_tool()
    pipe = _RecordingPipe()
    noise = np.random.RandomState(0).randn(1, 2, 16, 16, 16)
    frames = pipe.decode_latents(jnp.asarray(noise, jnp.float32))
    dump = {"noise": noise.astype(np.float32),
            "latents": noise.astype(np.float32),
            "frames": frames, "prompt": np.asarray("a dog"),
            "negative": np.asarray("")}
    pc.run_ours("unused.yaml", dump, "a dog", pipe=pipe)
    # gate decode first (tiled), then the fast-default decode (None ->
    # pipeline default), because attn_impl/stream differ from the gate
    assert pipe.decode_modes[1] == "tiled"
    assert pipe.decode_modes[2] is None
