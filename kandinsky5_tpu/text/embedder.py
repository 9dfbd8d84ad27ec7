"""Combined text conditioning: Qwen2.5-VL embeddings + CLIP pooled vector.

Mirrors the reference Kandinsky5TextEmbedder
(/root/reference/kandinsky/models/text_embedders.py:98-116): texts are
wrapped in the fixed system-prompt template, encoded by the Qwen text
tower (last hidden states, cropped past the template), and pooled by
CLIP. TPU differences: outputs are padded to the static config
max_length with boolean masks instead of varlen cu_seqlens packing.

Tokenizers come from HF (CPU-side, pure preprocessing); model weights
are converted into JAX pytrees at load.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from kandinsky5_tpu.config import TextEmbedderConfig
from kandinsky5_tpu.text.clip import ClipTextConfig, clip_pooled
from kandinsky5_tpu.text.qwen import (
    QwenTextConfig,
    qwen_encode,
    qwen_generate,
)

# Conditioning prompt templates and crop offsets — behavioral constants
# of the released checkpoints (reference text_embedders.py:35-53); the
# DiT was trained against embeddings produced under these exact system
# prompts, so they are reproduced verbatim.
PROMPT_TEMPLATE = {
    "video": (
        "<|im_start|>system\nYou are a promt engineer. Describe the video in detail.",
        "Describe how the camera moves or shakes, describe the zoom and view angle, whether it follows the objects.",
        "Describe the location of the video, main characters or objects and their action.",
        "Describe the dynamism of the video and presented actions.",
        "Name the visual style of the video: whether it is a professional footage, user generated content, some kind of animation, video game or scren content.",
        "Describe the visual effects, postprocessing and transitions if they are presented in the video.",
        "Pay attention to the order of key actions shown in the scene.<|im_end|>",
        "<|im_start|>user\n{}<|im_end|>",
    ),
    "image": (
        "<|im_start|>system\nYou are a promt engineer. Describe the image by detailing the color, shape, size, texture, quantity, text, spatial relationships of the objects and background:<|im_end|>",
        "<|im_start|>user\n{}<|im_end|>",
    ),
}
CROP_START = {"video": 129, "image": 41}

# Prompt-beautifier instruction for prompt expansion
# (reference t2v_pipeline.py:47-60), reproduced verbatim.
EXPAND_INSTRUCTION = """You are a prompt beautifier that transforms short user video descriptions into rich, detailed English prompts specifically optimized for video generation models.
        Here are some example descriptions from the dataset that the model was trained:
        1. "In a dimly lit room with a cluttered background, papers are pinned to the wall and various objects rest on a desk. Three men stand present: one wearing a red sweater, another in a black sweater, and the third in a gray shirt. The man in the gray shirt speaks and makes hand gestures, while the other two men look forward. The camera remains stationary, focusing on the three men throughout the sequence. A gritty and realistic visual style prevails, marked by a greenish tint that contributes to a moody atmosphere. Low lighting casts shadows, enhancing the tense mood of the scene."
        2. "In an office setting, a man sits at a desk wearing a gray sweater and seated in a black office chair. A wooden cabinet with framed pictures stands beside him, alongside a small plant and a lit desk lamp. Engaged in a conversation, he makes various hand gestures to emphasize his points. His hands move in different positions, indicating different ideas or points. The camera remains stationary, focusing on the man throughout. Warm lighting creates a cozy atmosphere. The man appears to be explaining something. The overall visual style is professional and polished, suitable for a business or educational context."
        3. "A person works on a wooden object resembling a sunburst pattern, holding it in their left hand while using their right hand to insert a thin wire into the gaps between the wooden pieces. The background features a natural outdoor setting with greenery and a tree trunk visible. The camera stays focused on the hands and the wooden object throughout, capturing the detailed process of assembling the wooden structure. The person carefully threads the wire through the gaps, ensuring the wooden pieces are securely fastened together. The scene unfolds with a naturalistic and instructional style, emphasizing the craftsmanship and the methodical steps taken to complete the task."
        IImportantly! These are just examples from a large training dataset of 200 million videos.
        Rewrite Prompt: "{}" to get high-quality video generation. Answer only with expanded prompt."""


def _read_config_json(checkpoint_path) -> Optional[dict]:
    import json

    path = os.path.join(str(checkpoint_path), "config.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def qwen_config_from_json(checkpoint_path) -> Optional[QwenTextConfig]:
    """Build :class:`QwenTextConfig` from an HF checkpoint's config.json.
    Qwen2.5-VL nests the text dims under ``text_config`` in newer
    transformers exports and keeps them top-level in older ones; both
    are accepted. None (-> released 7B defaults) when the file is absent."""
    raw = _read_config_json(checkpoint_path)
    if raw is None:
        return None
    tc = raw.get("text_config", raw)
    hidden = int(tc["hidden_size"])
    heads = int(tc["num_attention_heads"])
    return QwenTextConfig(
        vocab_size=int(tc["vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(tc["intermediate_size"]),
        num_hidden_layers=int(tc["num_hidden_layers"]),
        num_attention_heads=heads,
        num_key_value_heads=int(tc.get("num_key_value_heads", heads)),
        head_dim=int(tc.get("head_dim", hidden // heads)),
        rms_norm_eps=float(tc.get("rms_norm_eps", 1e-6)),
        rope_theta=float(tc.get("rope_theta", 1000000.0)),
        tie_word_embeddings=bool(tc.get("tie_word_embeddings", False)),
    )


def clip_config_from_json(checkpoint_path) -> Optional[ClipTextConfig]:
    """:class:`ClipTextConfig` from an HF CLIPTextModel config.json
    (``text_config`` nesting accepted). None -> ViT-L/14 defaults."""
    raw = _read_config_json(checkpoint_path)
    if raw is None:
        return None
    tc = raw.get("text_config", raw)
    return ClipTextConfig(
        vocab_size=int(tc["vocab_size"]),
        hidden_size=int(tc["hidden_size"]),
        intermediate_size=int(tc["intermediate_size"]),
        num_hidden_layers=int(tc["num_hidden_layers"]),
        num_attention_heads=int(tc["num_attention_heads"]),
        max_position_embeddings=int(tc.get("max_position_embeddings", 77)),
        eos_token_id=int(tc.get("eos_token_id", 2)),
    )


@dataclass
class TextEmbeddings:
    """Padded conditioning bundle (the TPU-shaped analog of the
    reference's {"text_embeds", "pooled_embed"} + cu_seqlens)."""

    text_embeds: jnp.ndarray  # (B, L, 3584)
    pooled_embed: jnp.ndarray  # (B, 768)
    mask: jnp.ndarray  # (B, L) bool


class Kandinsky5TextEmbedder:
    """Qwen2.5-VL + CLIP conditioning encoder with HF tokenizers."""

    def __init__(self, conf: TextEmbedderConfig, qwen_params=None,
                 clip_params=None, qwen_cfg: Optional[QwenTextConfig] = None,
                 clip_cfg: Optional[ClipTextConfig] = None,
                 qwen_tokenizer=None, clip_tokenizer=None):
        self.conf = conf
        self.qwen_cfg = qwen_cfg or QwenTextConfig()
        self.clip_cfg = clip_cfg or ClipTextConfig()
        self.qwen_params = qwen_params
        self.clip_params = clip_params
        self.qwen_tokenizer = qwen_tokenizer
        self.clip_tokenizer = clip_tokenizer

    @classmethod
    def from_pretrained(cls, conf: TextEmbedderConfig, dtype=jnp.bfloat16):
        """Load weights + tokenizers from the HF checkpoint directories
        (the reference's download layout, kandinsky/utils.py:75-87).
        Model dimensions come from each directory's ``config.json`` —
        exactly what HF ``from_pretrained`` reads (reference
        text_embedders.py:14,56) — falling back to the released 7B /
        ViT-L defaults when the file is absent."""
        from transformers import AutoTokenizer

        from kandinsky5_tpu.checkpoint import (
            convert_clip_state_dict,
            convert_qwen_state_dict,
        )
        from kandinsky5_tpu.utils.io import load_sharded_safetensors

        qwen_sd = load_sharded_safetensors(conf.qwen.checkpoint_path)
        clip_sd = load_sharded_safetensors(conf.clip.checkpoint_path)
        return cls(
            conf,
            qwen_params=convert_qwen_state_dict(qwen_sd, dtype=dtype),
            clip_params=convert_clip_state_dict(clip_sd, dtype=jnp.float32),
            qwen_cfg=qwen_config_from_json(conf.qwen.checkpoint_path),
            clip_cfg=clip_config_from_json(conf.clip.checkpoint_path),
            qwen_tokenizer=AutoTokenizer.from_pretrained(
                conf.qwen.checkpoint_path),
            clip_tokenizer=AutoTokenizer.from_pretrained(
                conf.clip.checkpoint_path),
        )

    # -- tokenization -------------------------------------------------

    def _qwen_tokenize(self, texts: List[str], type_of_content: str):
        template = "\n".join(PROMPT_TEMPLATE[type_of_content])
        crop = CROP_START[type_of_content]
        full = [template.format(t) for t in texts]
        enc = self.qwen_tokenizer(
            full, max_length=self.conf.qwen.max_length + crop,
            truncation=True, padding="max_length", return_tensors="np")
        return enc["input_ids"], enc["attention_mask"].astype(bool), crop

    def _clip_tokenize(self, texts: List[str]):
        enc = self.clip_tokenizer(
            texts, max_length=self.conf.clip.max_length, truncation=True,
            add_special_tokens=True, padding="max_length", return_tensors="np")
        return enc["input_ids"], enc["attention_mask"]

    # -- public API ---------------------------------------------------

    def encode(self, texts: List[str],
               type_of_content: str = "video") -> TextEmbeddings:
        """Reference Kandinsky5TextEmbedder.encode
        (text_embedders.py:104-107), padded output."""
        ids, mask, crop = self._qwen_tokenize(texts, type_of_content)
        embeds, emb_mask = qwen_encode(self.qwen_params, self.qwen_cfg,
                                       ids, mask, crop)
        cids, cmask = self._clip_tokenize(texts)
        pooled = clip_pooled(self.clip_params, self.clip_cfg,
                             jnp.asarray(cids), jnp.asarray(cmask))
        return TextEmbeddings(text_embeds=embeds, pooled_embed=pooled,
                              mask=emb_mask)

    def _generation_config(self) -> dict:
        """The checkpoint's generation_config.json, if downloaded — the
        reference's ``model.generate`` picks these values up implicitly
        (t2v_pipeline.py:76-78); we read the same file explicitly.
        Cached; {} when absent (greedy fallback)."""
        if not hasattr(self, "_gen_conf"):
            import json
            import os

            self._gen_conf = {}
            path = os.path.join(str(self.conf.qwen.checkpoint_path),
                                "generation_config.json")
            try:
                with open(path) as f:
                    self._gen_conf = json.load(f)
            except (OSError, ValueError):
                pass
        return self._gen_conf

    def expand_prompt(self, prompt: str, sample: Optional[bool] = None,
                      seed: int = 0) -> str:
        """Prompt beautification via Qwen generation (reference
        t2v_pipeline.py:47-88). ``sample=None`` follows the checkpoint's
        generation_config.json exactly like HF .generate does
        (do_sample/temperature/top_p/top_k/repetition_penalty, seeded);
        False forces deterministic greedy; True forces sampling with the
        config's (or default) knobs."""
        messages = [{"role": "user",
                     "content": [{"type": "text",
                                  "text": EXPAND_INSTRUCTION.format(prompt)}]}]
        text = self.qwen_tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        ids = self.qwen_tokenizer(text, return_tensors="np")["input_ids"]
        gc = self._generation_config()
        do_sample = bool(gc.get("do_sample", False)) if sample is None \
            else bool(sample)
        import os

        gen_params = self.qwen_params
        if os.environ.get("KANDINSKY5_TPU_INT8_EXPAND"):
            # opt-in: int8 decode weights halve the bandwidth-bound
            # per-token cost (~19 -> ~10 ms on v5e); expansion only —
            # the conditioning encoder keeps bf16 numerics
            if not hasattr(self, "_qwen_params_q"):
                from kandinsky5_tpu.text.qwen import (
                    quantize_qwen_decode_params,
                )

                self._qwen_params_q = quantize_qwen_decode_params(
                    self.qwen_params)
            gen_params = self._qwen_params_q
        new_ids = qwen_generate(
            gen_params, self.qwen_cfg, ids, max_new_tokens=256,
            do_sample=do_sample,
            temperature=float(gc.get("temperature", 1.0)),
            top_p=float(gc.get("top_p", 1.0)),
            # HF GenerationConfig defaults top_k to 50 when the json
            # omits the key — match .generate exactly
            top_k=int(gc.get("top_k", 50)),
            repetition_penalty=float(gc.get("repetition_penalty", 1.0)),
            seed=seed)
        return self.qwen_tokenizer.decode(new_ids, skip_special_tokens=True)


def get_text_embedder(conf: TextEmbedderConfig, dtype=jnp.bfloat16):
    """Factory matching the reference get_text_embedder
    (text_embedders.py:115-116)."""
    return Kandinsky5TextEmbedder.from_pretrained(conf, dtype=dtype)
