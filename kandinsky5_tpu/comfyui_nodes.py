"""ComfyUI integration: stage-level graph nodes.

Mirrors the reference node set (/root/reference/comfyui/
nodes_kandinsky.py:16-275): independent load / encode / expand /
generate / decode stages with tensor handoffs, usable both as ComfyUI
nodes (NODE_CLASS_MAPPINGS below) and as a plain low-level Python API —
the second public API surface described in SURVEY.md §3.3.

The module imports without a ComfyUI host installed.
"""

from __future__ import annotations


import numpy as np

import jax.numpy as jnp

CATEGORY = "Kandinsky5-TPU"


class Kandinsky5LoadTextEmbedders:
    """Load Qwen2.5-VL + CLIP conditioning encoders
    (reference nodes_kandinsky.py:16-38)."""

    RETURN_TYPES = ("K5_TEXT_EMBEDDER",)
    FUNCTION = "load"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "qwen_path": ("STRING", {"default": "./weights/text_encoder/"}),
            "clip_path": ("STRING", {"default": "./weights/text_encoder2/"}),
        }}

    def load(self, qwen_path, clip_path):
        from kandinsky5_tpu.config import TextEmbedderConfig, TextEncoderConfig
        from kandinsky5_tpu.text.embedder import Kandinsky5TextEmbedder

        conf = TextEmbedderConfig(
            qwen=TextEncoderConfig(checkpoint_path=qwen_path, emb_size=3584,
                                   max_length=256),
            clip=TextEncoderConfig(checkpoint_path=clip_path, emb_size=768,
                                   max_length=77),
        )
        return (Kandinsky5TextEmbedder.from_pretrained(conf),)


class Kandinsky5LoadDiT:
    """Load a DiT checkpoint (reference nodes_kandinsky.py:40-65)."""

    RETURN_TYPES = ("K5_DIT",)
    FUNCTION = "load"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "checkpoint_path": ("STRING", {"default":
                "./weights/model/kandinsky5lite_t2v_sft_5s.safetensors"}),
            "attention_type": (["flash", "nabla"],),
        }}

    def load(self, checkpoint_path, attention_type="flash"):
        from kandinsky5_tpu.checkpoint import load_dit_checkpoint
        from kandinsky5_tpu.config import DiTParams

        cfg = DiTParams()
        params = load_dit_checkpoint(checkpoint_path, cfg)
        return ({"params": params, "cfg": cfg, "attention_type": attention_type},)


class Kandinsky5LoadVAE:
    """Load the HunyuanVideo VAE (reference nodes_kandinsky.py:93-113)."""

    RETURN_TYPES = ("K5_VAE",)
    FUNCTION = "load"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "vae_path": ("STRING", {"default": "./weights/vae/"}),
        }}

    def load(self, vae_path):
        from kandinsky5_tpu.checkpoint import load_vae_checkpoint
        from kandinsky5_tpu.models.vae import HunyuanVideoVAE

        return (HunyuanVideoVAE(load_vae_checkpoint(vae_path)),)


class Kandinsky5TextEncode:
    """Encode a caption into conditioning embeddings
    (reference nodes_kandinsky.py:67-91)."""

    RETURN_TYPES = ("K5_COND",)
    FUNCTION = "encode"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "text_embedder": ("K5_TEXT_EMBEDDER",),
            "prompt": ("STRING", {"multiline": True}),
            "type_of_content": (["video", "image"],),
        }}

    def encode(self, text_embedder, prompt, type_of_content="video"):
        emb = text_embedder.encode([prompt], type_of_content)
        return ({"text_embeds": emb.text_embeds,
                 "pooled_embed": emb.pooled_embed, "mask": emb.mask},)


class Kandinsky5PromptExpand:
    """Beautify a prompt with Qwen (reference nodes_kandinsky.py:115-174)."""

    RETURN_TYPES = ("STRING",)
    FUNCTION = "expand"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "text_embedder": ("K5_TEXT_EMBEDDER",),
            "prompt": ("STRING", {"multiline": True}),
        }}

    def expand(self, text_embedder, prompt):
        return (text_embedder.expand_prompt(prompt),)


class Kandinsky5Generate:
    """Run the flow-matching denoise loop (reference
    nodes_kandinsky.py:175-227)."""

    RETURN_TYPES = ("K5_LATENT",)
    FUNCTION = "generate"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "dit": ("K5_DIT",),
            "cond": ("K5_COND",),
            "negative_cond": ("K5_COND",),
            "width": ("INT", {"default": 768}),
            "height": ("INT", {"default": 512}),
            "length": ("INT", {"default": 121, "tooltip": "video frames"}),
            "steps": ("INT", {"default": 50}),
            "guidance_weight": ("FLOAT", {"default": 5.0}),
            "scheduler_scale": ("FLOAT", {"default": 10.0}),
            "seed": ("INT", {"default": 6554}),
        }}

    def generate(self, dit, cond, negative_cond, width, height, length,
                 steps, guidance_weight, scheduler_scale, seed):
        from kandinsky5_tpu.sampling import DenoiseSpec, generate_latents

        # pixel dims -> latent dims (reference nodes_kandinsky.py:201-218)
        num_latent_frames = (length - 1) // 4 + 1
        shape = (1, num_latent_frames, height // 8, width // 8, 16)
        spec = DenoiseSpec(
            dit_params=dit["cfg"], num_steps=steps,
            guidance_weight=guidance_weight, scheduler_scale=scheduler_scale,
            scale_factor=(1.0, 2.0, 2.0),
            attention_type=dit.get("attention_type", "flash"),
        )
        latents = generate_latents(dit["params"], spec, shape, cond,
                                   negative_cond, seed=seed)
        return (latents,)


class Kandinsky5VAEDecode:
    """Decode latents to frames (reference nodes_kandinsky.py:229-255)."""

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "decode"
    CATEGORY = CATEGORY

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "vae": ("K5_VAE",),
            "latent": ("K5_LATENT",),
        }}

    def decode(self, vae, latent):
        z = latent / vae.scaling_factor
        video = vae.decode(z, mode=vae.default_decode_mode())
        video = jnp.clip(video.astype(jnp.float32), -1.0, 1.0)
        frames = np.asarray((video + 1.0) / 2.0)  # ComfyUI expects [0,1]
        return (frames[0],)


NODE_CLASS_MAPPINGS = {
    "Kandinsky5LoadTextEmbedders": Kandinsky5LoadTextEmbedders,
    "Kandinsky5LoadDiT": Kandinsky5LoadDiT,
    "Kandinsky5LoadVAE": Kandinsky5LoadVAE,
    "Kandinsky5TextEncode": Kandinsky5TextEncode,
    "Kandinsky5PromptExpand": Kandinsky5PromptExpand,
    "Kandinsky5Generate": Kandinsky5Generate,
    "Kandinsky5VAEDecode": Kandinsky5VAEDecode,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    name: name.replace("Kandinsky5", "Kandinsky5 TPU ")
    for name in NODE_CLASS_MAPPINGS
}
