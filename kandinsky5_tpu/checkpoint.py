"""Checkpoint conversion: torch safetensors -> JAX pytree.

The released DiT checkpoints are torch state dicts (814 tensors,
2,007,702,848 params — SURVEY.md Appendix A; loaded by the reference at
kandinsky/utils.py:115-116). This module maps them bit-faithfully onto
the stacked pytree layout of models/dit.py:

  * Linear ``weight`` tensors are transposed torch (out, in) ->
    JAX (in, out);
  * per-block tensors ``{text,visual}_transformer_blocks.{i}.…`` are
    stacked along a new leading block axis (for lax.scan);
  * everything else passes through unchanged.

RoPE tables are non-persistent buffers in the reference (nn.py:49-50,
107,129) and never appear in checkpoints; we recompute them.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from kandinsky5_tpu.config import DiTParams

# 2-D '.weight' tensors that are NOT linear layers (none in this model —
# LayerNorm/RMSNorm weights are 1-D), so: transpose every 2-D weight.
_BLOCK_RE = re.compile(r"^(text_transformer_blocks|visual_transformer_blocks)\.(\d+)\.(.+)$")


def _insert(tree: dict, path: str, value):
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_dit_state_dict(
    state_dict: Mapping[str, np.ndarray],
    cfg: DiTParams,
    dtype=jnp.bfloat16,
) -> dict:
    """Convert a torch DiT state dict (numpy arrays) to the model pytree."""
    tree: dict = {}
    blocks: Dict[str, Dict[int, dict]] = {
        "text_transformer_blocks": {},
        "visual_transformer_blocks": {},
    }
    expected_blocks = {
        "text_transformer_blocks": cfg.num_text_blocks,
        "visual_transformer_blocks": cfg.num_visual_blocks,
    }

    for key, value in state_dict.items():
        arr = np.asarray(value)
        if key.endswith(".weight") and arr.ndim == 2:
            arr = arr.T  # torch (out, in) -> JAX (in, out)
        m = _BLOCK_RE.match(key)
        if m:
            coll, idx, rest = m.group(1), int(m.group(2)), m.group(3)
            _insert(blocks[coll].setdefault(idx, {}), rest, arr)
        else:
            _insert(tree, key, arr)

    for coll, by_idx in blocks.items():
        n = expected_blocks[coll]
        assert len(by_idx) == n, (
            f"{coll}: got {len(by_idx)} blocks, expected {n}"
        )
        tree[coll] = _stack_layers(by_idx)

    return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), tree)


def load_dit_checkpoint(path: str, cfg: DiTParams, dtype=jnp.bfloat16) -> dict:
    """Load a released ``.safetensors`` DiT checkpoint into the pytree
    (torch-backed loader: the released files are bfloat16, which the
    numpy safetensors backend cannot represent)."""
    from kandinsky5_tpu.utils.io import load_sharded_safetensors

    return convert_dit_state_dict(load_sharded_safetensors(path), cfg,
                                  dtype=dtype)


def convert_vae_state_dict(
    state_dict: Mapping[str, np.ndarray],
    dtype=jnp.bfloat16,
) -> dict:
    """Convert the HF HunyuanVideo VAE state dict to the NDHWC pytree of
    models/vae.py.

    torch Conv3d weights (O, I, kT, kH, kW) -> DHWIO; attention Linear
    weights (O, I) -> (I, O); norms pass through. Key paths are kept
    verbatim (digit segments become string dict keys).
    """
    tree: dict = {}
    for key, value in state_dict.items():
        arr = np.asarray(value)
        if key.endswith(".weight"):
            if arr.ndim == 5:  # Conv3d
                arr = arr.transpose(2, 3, 4, 1, 0)
            elif arr.ndim == 2:  # Linear (mid-block attention)
                arr = arr.T
        # causal conv wrappers hold the real conv at ``<name>.conv.*``;
        # our pytree flattens that level away
        for suffix in (".conv.weight", ".conv.bias"):
            if key.endswith(suffix):
                key = key[: -len(suffix)] + suffix[len(".conv"):]
                break
        _insert(tree, key, arr)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), tree)


def load_vae_checkpoint(path: str, dtype=jnp.bfloat16) -> dict:
    """Load diffusers ``vae/diffusion_pytorch_model.safetensors``."""
    import os

    from safetensors.numpy import load_file

    if os.path.isdir(path):
        for cand in ("diffusion_pytorch_model.safetensors",
                     os.path.join("vae", "diffusion_pytorch_model.safetensors")):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    return convert_vae_state_dict(load_file(path), dtype=dtype)


def _stack_layers(by_idx: Dict[int, dict]) -> dict:
    n = len(by_idx)
    assert sorted(by_idx) == list(range(n)), sorted(by_idx)
    return jax.tree.map(lambda *xs: np.stack(xs), *[by_idx[i] for i in range(n)])


def convert_qwen_state_dict(state_dict: Mapping[str, np.ndarray],
                            dtype=jnp.bfloat16) -> dict:
    """HF Qwen2.5-VL state dict -> text/qwen.py pytree.

    Handles both layouts ("model.language_model.*" in transformers>=4.52
    and "model.*" before); the vision tower is dropped (the pipeline is
    text-only, reference text_embedders.py:70-81 passes images=None).
    Linear weights transpose to (in, out); embed_tokens stays (vocab, d).
    """
    tree: dict = {}
    layers: Dict[int, dict] = {}
    layer_re = re.compile(r"^layers\.(\d+)\.(.+)$")
    for key, value in state_dict.items():
        if "visual" in key:
            continue
        for prefix in ("model.language_model.", "language_model.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        arr = np.asarray(value)
        if key.endswith(".weight") and arr.ndim == 2 and "embed_tokens" not in key:
            arr = arr.T
        m = layer_re.match(key)
        if m:
            _insert(layers.setdefault(int(m.group(1)), {}), m.group(2), arr)
        else:
            _insert(tree, key, arr)
    tree["layers"] = _stack_layers(layers)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), tree)


def convert_qwen_vision_state_dict(state_dict: Mapping[str, np.ndarray],
                                   dtype=jnp.bfloat16) -> dict:
    """HF Qwen2.5-VL ``visual.*`` weights -> text/qwen_vision.py pytree.

    The text converter (convert_qwen_state_dict) drops the vision tower
    (the T2V pipeline is text-only); this converter picks it up for the
    image-conditioned surface. blocks stack along a leading depth axis
    (lax.scan); Linear weights transpose to (in, out); the 5-D patch
    conv (embed, C, tps, ps, ps) flattens to (embed, C*tps*ps*ps) — the
    stride==kernel conv is one GEMM over flattened patches."""
    tree: dict = {}
    blocks: Dict[int, dict] = {}
    block_re = re.compile(r"^blocks\.(\d+)\.(.+)$")
    for key, value in state_dict.items():
        if not key.startswith("visual."):
            continue
        key = key[len("visual."):]
        arr = np.asarray(value)
        if key == "patch_embed.proj.weight":
            arr = arr.reshape(arr.shape[0], -1)  # (embed, flat patch)
        elif key.endswith(".weight") and arr.ndim == 2:
            arr = arr.T
        m = block_re.match(key)
        if m:
            _insert(blocks.setdefault(int(m.group(1)), {}), m.group(2), arr)
        else:
            _insert(tree, key, arr)
    tree["blocks"] = _stack_layers(blocks)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), tree)


def convert_clip_state_dict(state_dict: Mapping[str, np.ndarray],
                            dtype=jnp.float32) -> dict:
    """HF CLIPTextModel state dict -> text/clip.py pytree."""
    tree: dict = {}
    layers: Dict[int, dict] = {}
    layer_re = re.compile(r"^encoder\.layers\.(\d+)\.(.+)$")
    for key, value in state_dict.items():
        if key.startswith("text_model."):
            key = key[len("text_model."):]
        if key.startswith("text_projection") or "position_ids" in key:
            continue
        arr = np.asarray(value)
        if (key.endswith(".weight") and arr.ndim == 2
                and "embedding" not in key):
            arr = arr.T
        m = layer_re.match(key)
        if m:
            _insert(layers.setdefault(int(m.group(1)), {}), m.group(2), arr)
        else:
            _insert(tree, key, arr)
    tree["layers"] = _stack_layers(layers)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), tree)


def dit_params_to_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse conversion (JAX pytree -> torch-layout state dict), used for
    checkpoint round-trip tests and for exporting."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
            return
        arr = np.asarray(node)
        out[prefix] = arr

    flat: dict = {}
    for k, v in params.items():
        if k in ("text_transformer_blocks", "visual_transformer_blocks"):
            leaves, treedef = jax.tree.flatten(v)
            n = leaves[0].shape[0]
            for i in range(n):
                sub = jax.tree.unflatten(treedef, [l[i] for l in leaves])
                flat[f"{k}.{i}"] = sub
        else:
            flat[k] = v
    for k, v in flat.items():
        walk(v, k)

    for key in list(out):
        if key.endswith(".weight") and out[key].ndim == 2:
            out[key] = out[key].T
    return out
