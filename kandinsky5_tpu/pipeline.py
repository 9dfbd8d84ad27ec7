"""Kandinsky5T2VPipeline — the user-facing text-to-video pipeline.

TPU re-design of the reference pipeline object
(/root/reference/kandinsky/t2v_pipeline.py:10-189) and factory
(kandinsky/utils.py:23-134). Single-controller JAX removes the
reference's rank choreography (seed broadcast, prompt
broadcast_object_list, torchrun launch — t2v_pipeline.py:108-139): one
process drives the whole mesh.

Stage flow per generation (reference generate_sample,
generation_utils.py:132-228):
  text encode (Qwen + CLIP) -> jitted flow-matching denoise scan
  (sampling.py) -> tiled VAE decode -> uint8 frames -> mp4/PNG.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from kandinsky5_tpu.config import Config, load_config
from kandinsky5_tpu.sampling import DenoiseSpec, generate_latents

DEFAULT_NEGATIVE = (
    "Static, 2D cartoon, cartoon, 2d animation, paintings, images, worst "
    "quality, low quality, ugly, deformed, walking backwards"
)  # reference t2v_pipeline.py:100

RESOLUTIONS = {512: [(512, 512), (512, 768), (768, 512)]}  # t2v_pipeline.py:43-45


def default_attn_impl(n_dev: int = 1) -> str:
    """Pipeline attention default.

    Single-chip TPU inference defaults to the int8-QK flash kernel
    (ops/flash_pallas): measured 6.37 vs 7.27 s/NFE with a 16-step
    latent PSNR of 82 dB vs the bf16 kernel at the full 2B architecture
    — deep below the 35 dB fidelity gate (DEVIATIONS.md). Faithful bf16
    via KANDINSKY5_TPU_ATTN=auto (or =flash/dense). Meshes default to
    "auto" (bf16, faithful); KANDINSKY5_TPU_ATTN=flash_int8 is the one
    flag that flips a MESH pipeline to the int8-QK kernel per shard
    (ops/attention._sharded_attention threads impl into shard_map;
    parity on the virtual mesh: tests/test_tp_parity.py::
    test_int8_mesh_matches_single_device; the driver dryrun exercises
    the same path)."""
    env = os.environ.get("KANDINSKY5_TPU_ATTN")
    if env:
        return env
    if n_dev <= 1 and jax.default_backend() in ("tpu", "axon"):
        return "flash_int8"
    return "auto"


class Kandinsky5T2VPipeline:
    def __init__(
        self,
        dit_params,
        conf: Config,
        text_embedder=None,
        vae=None,
        mesh=None,
        magcache: bool = False,
        offload: bool = False,
    ):
        from kandinsky5_tpu.utils.offload import ParamStore

        self.conf = conf
        self.text_embedder = text_embedder
        self.vae = vae
        self.mesh = mesh
        self.magcache = magcache
        self.offload = offload
        # host-RAM staging between stages (reference --offload analog,
        # generation_utils.py:164-226)
        self._dit_store = ParamStore(dit_params, offload=offload)
        self._vae_store = (ParamStore(vae.params, offload=True)
                           if offload and vae is not None else None)
        self._text_stores = None
        if offload and text_embedder is not None:
            self._text_stores = (
                ParamStore(text_embedder.qwen_params, offload=True),
                ParamStore(text_embedder.clip_params, offload=True),
            )
        self.resolution = conf.resolution
        if self.resolution not in RESOLUTIONS:
            raise ValueError("Resolution can be only 512")

    @property
    def dit_params(self):
        return self._dit_store.params

    def _spec(self, num_steps, guidance_weight, scheduler_scale) -> DenoiseSpec:
        m = self.conf.model
        # 10s sequences exhaust a single chip's HBM with the batched CFG
        # pair; fall back to the reference's sequential scheme there
        n_dev = 1 if self.mesh is None else int(np.prod(list(self.mesh.shape.values())))
        sequential_cfg = m.attention.type == "nabla" and n_dev < 2
        return DenoiseSpec(
            attn_impl=default_attn_impl(n_dev),
            dit_params=m.dit_params,
            num_steps=num_steps,
            guidance_weight=guidance_weight,
            scheduler_scale=scheduler_scale,
            scale_factor=tuple(self.conf.metrics.scale_factor),
            attention_type=m.attention.type,
            nabla_P=m.attention.P,
            nabla_wT=m.attention.wT,
            nabla_wH=m.attention.wH,
            nabla_wW=m.attention.wW,
            nabla_shared_mask=getattr(m.attention, "shared_mask", False),
            nabla_q_rows=getattr(m.attention, "q_rows", 8),
            nabla_max_density=getattr(m.attention, "max_density", 0.75),
            nabla_method=getattr(m.attention, "threshold_method", "bisect"),
            sequential_cfg=sequential_cfg,
        )

    def expand_prompt(self, prompt: str) -> str:
        return self.text_embedder.expand_prompt(prompt)

    def __call__(
        self,
        text: Union[str, List[str]],
        time_length: int = 5,  # seconds; 0 => single image
        width: int = 768,
        height: int = 512,
        seed: Optional[int] = None,
        num_steps: Optional[int] = None,
        guidance_weight: Optional[float] = None,
        scheduler_scale: float = 10.0,
        negative_caption: str = DEFAULT_NEGATIVE,
        expand_prompts: bool = True,
        save_path: Optional[Union[str, List[str]]] = None,
        progress: bool = True,
        host_loop: Optional[bool] = None,
        checkpoint_path: Optional[str] = None,
    ):
        num_steps = self.conf.model.num_steps if num_steps is None else num_steps
        guidance_weight = (self.conf.model.guidance_weight
                           if guidance_weight is None else guidance_weight)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        if (height, width) not in RESOLUTIONS[self.resolution]:
            raise ValueError(
                f"Wrong height, width pair. Available (height, width) are: "
                f"{RESOLUTIONS[self.resolution]}")

        # frame count: 24 fps, 4x VAE temporal compression
        # (reference t2v_pipeline.py:128)
        num_frames = 1 if time_length == 0 else time_length * 24 // 4 + 1
        type_of_content = "image" if time_length == 0 else "video"

        captions = [text] if isinstance(text, str) else list(text)
        if self._text_stores is not None:
            self.text_embedder.qwen_params = self._text_stores[0].stage()
            self.text_embedder.clip_params = self._text_stores[1].stage()
        if expand_prompts:
            captions = [self.expand_prompt(c) for c in captions]

        batch = len(captions)
        cond = self.text_embedder.encode(captions, type_of_content)
        uncond = self.text_embedder.encode([negative_caption] * batch,
                                           type_of_content)
        if self._text_stores is not None:
            self._text_stores[0].unstage()
            self._text_stores[1].unstage()
            self.text_embedder.qwen_params = None
            self.text_embedder.clip_params = None

        latent_shape = (batch, num_frames, height // 8, width // 8, 16)
        spec = self._spec(num_steps, guidance_weight, scheduler_scale)
        mag = self.conf.magcache if self.magcache else None

        cond_d = {"text_embeds": cond.text_embeds,
                  "pooled_embed": cond.pooled_embed, "mask": cond.mask}
        uncond_d = {"text_embeds": uncond.text_embeds,
                    "pooled_embed": uncond.pooled_embed, "mask": uncond.mask}

        if host_loop is None:
            # escape hatch for runtimes that bound single-execution wall
            # time (see sampling.denoise_host_loop)
            import os

            host_loop = os.environ.get("KANDINSKY5_TPU_HOST_LOOP", "") == "1"

        t0 = time.time()
        dit_params = self._dit_store.stage()
        # enter the mesh context so the model's sharding constraints
        # (constrain_heads/constrain_seq) apply on the TP path — the
        # analog of the reference running under its DTensor plan
        # (parallelize.py:11-102)
        from kandinsky5_tpu.parallel.sharding import sharding_ctx

        with sharding_ctx(self.mesh):
            if checkpoint_path is not None:
                # preemption-safe chunked denoise: resumes from the
                # state file if the same job was interrupted
                from kandinsky5_tpu.utils.resume import resumable_generate

                latents = resumable_generate(
                    dit_params, spec, latent_shape, cond_d, uncond_d,
                    seed=seed, checkpoint_path=checkpoint_path,
                    magcache=mag, progress=progress)
            else:
                latents = generate_latents(dit_params, spec, latent_shape,
                                           cond_d, uncond_d, seed=seed,
                                           magcache=mag, host_loop=host_loop,
                                           progress=progress)
        if progress:
            latents.block_until_ready()
            print(f"denoise: {time.time() - t0:.1f}s "
                  f"({num_steps} steps, cfg={spec.use_cfg})")
        self._dit_store.unstage()

        # latent -> pixels (reference generation_utils.py:210-222)
        frames = self.decode_latents(latents)

        if save_path is not None:
            self.save(frames, save_path, time_length)
        return frames

    def decode_latents(self, latents: jnp.ndarray,
                       mode: Optional[str] = None) -> np.ndarray:
        """(B, T', H', W', 16) -> (B, T, H, W, 3) uint8 frames.

        Decode mode policy (override: ``mode=`` argument, then
        KANDINSKY5_TPU_VAE_DECODE=tiled|stream): on a single device the
        streaming state-carry decode (models/vae_stream.py) — no overlap
        recompute (~2x fewer conv FLOPs) and measurably closer to the
        untiled network than the reference's own tiling
        (tests/test_vae_stream.py); on a multi-device mesh the faithful
        tiled path, whose independent temporal tiles dp-batch across
        chips (streaming is serial in time). The parity gate
        (tools/parity_check.py) passes mode="tiled" explicitly — the
        reference decodes tiled (reference vae.py:1144-1204).
        """
        if self._vae_store is not None:
            self.vae.params = self._vae_store.stage()
        z = latents / self.vae.scaling_factor
        video = self.vae.decode(
            z, mode=mode or self.vae.default_decode_mode())
        video = jnp.clip(video.astype(jnp.float32), -1.0, 1.0)
        video = ((video + 1.0) * 127.5).astype(jnp.uint8)
        out = np.asarray(video)  # forces completion before unstaging
        if self._vae_store is not None:
            self._vae_store.unstage()
            self.vae.params = None
        return out

    def save(self, frames: np.ndarray, save_path: Union[str, List[str]],
             time_length: int) -> None:
        from kandinsky5_tpu.utils.io import write_image, write_video

        if isinstance(save_path, str):
            save_path = [save_path]
        for path, video in zip(save_path, frames):
            if time_length == 0:
                write_image(path, video[0])
            else:
                write_video(path, video, fps=24, crf=5)


def get_T2V_pipeline(
    device_map=None,
    resolution: int = 512,
    cache_dir: str = "./weights/",
    dit_path: Optional[str] = None,
    text_encoder_path: Optional[str] = None,
    text_encoder2_path: Optional[str] = None,
    vae_path: Optional[str] = None,
    conf_path: Optional[str] = None,
    offload: bool = False,
    magcache: bool = False,
    tp: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> Kandinsky5T2VPipeline:
    """Build the full pipeline (reference get_T2V_pipeline,
    kandinsky/utils.py:23-134). ``device_map`` is accepted for API
    compatibility and ignored — JAX owns device placement; ``tp`` sets
    the tensor-parallel width over the local mesh (replaces torchrun
    world size).
    """
    from kandinsky5_tpu.checkpoint import load_dit_checkpoint, load_vae_checkpoint
    from kandinsky5_tpu.config import get_default_conf
    from kandinsky5_tpu.models.vae import HunyuanVideoVAE
    from kandinsky5_tpu.text.embedder import Kandinsky5TextEmbedder

    if conf_path is not None:
        conf = load_config(conf_path)
    else:
        conf = get_default_conf(
            dit_path or f"{cache_dir}/model/kandinsky5lite_t2v_sft_5s.safetensors",
            vae_path or f"{cache_dir}/vae/",
            text_encoder_path or f"{cache_dir}/text_encoder/",
            text_encoder2_path or f"{cache_dir}/text_encoder2/",
        )

    dit_params = load_dit_checkpoint(conf.model.checkpoint_path,
                                     conf.model.dit_params, dtype=dtype)
    if os.environ.get("KANDINSKY5_TPU_INT8_LINEAR"):
        # opt-in W8A8 projections (models/dit.py:quantize_dit_params);
        # TP sharding of quantized trees is spec-adapted in
        # parallel.sharding._adapt_quantized_specs
        from kandinsky5_tpu.models.dit import quantize_dit_params

        dit_params = quantize_dit_params(dit_params)
    vae = HunyuanVideoVAE(
        load_vae_checkpoint(conf.model.vae.checkpoint_path, dtype=dtype),
        dtype=dtype)
    text_embedder = Kandinsky5TextEmbedder.from_pretrained(
        conf.model.text_embedder, dtype=dtype)

    mesh = None
    if tp is not None and tp > 1:
        from kandinsky5_tpu.parallel.sharding import (
            make_hybrid_mesh,
            make_mesh,
            shard_dit_params,
        )

        if jax.process_count() > 1:
            # multi-host fleet: tp stays on each host's ICI (spare
            # per-host chips become in-slice dp), the hosts form a dp
            # axis over DCN (CFG pair / batch sharding) — the growth
            # path past the reference's single-node 4-GPU cap
            per_host = jax.local_device_count()
            assert per_host % tp == 0, (
                f"tp={tp} must divide the {per_host} local devices")
            mesh = make_hybrid_mesh(tp=tp, dp_ici=per_host // tp)
            # the VAE's dp-batched tile decode stages host-local arrays,
            # so its mesh must span only THIS process's devices
            vae_devices = jax.local_devices()
        else:
            from kandinsky5_tpu.parallel.sharding import plan_dit_mesh

            # tp here means "use N chips": heads take the largest
            # divisor of N that divides them; the rest slices the
            # attention sequence (sp; ops/attention._sharded_attention)
            mesh = plan_dit_mesh(tp, num_heads=conf.model.dit_params.num_heads)
            vae_devices = list(mesh.devices.flat)
        dit_params = shard_dit_params(dit_params, mesh)
        # the VAE decodes temporal tiles as a dp-sharded batch
        # (models/vae.py:_temporal_tiled_decode)
        vae.mesh = make_mesh(n_devices=len(vae_devices),
                             dp=len(vae_devices), devices=vae_devices)

    return Kandinsky5T2VPipeline(
        dit_params=dit_params, conf=conf, text_embedder=text_embedder,
        vae=vae, mesh=mesh, magcache=magcache, offload=offload)
