"""Parity: JAX Qwen2.5-VL text tower and CLIP text encoder vs HF
transformers (torch CPU) on tiny random-init configs."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky5_tpu.checkpoint import (
    convert_clip_state_dict,
    convert_qwen_state_dict,
)
from kandinsky5_tpu.text.clip import ClipTextConfig, clip_text_forward
from kandinsky5_tpu.text.qwen import (
    QwenTextConfig,
    qwen_generate_greedy,
    qwen_hidden_states,
)


@pytest.fixture(scope="module")
def tiny_qwen():
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, hidden_act="silu",
            max_position_embeddings=512, rms_norm_eps=1e-6,
            rope_theta=1000000.0, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        ),
        vision_config=dict(
            depth=1, hidden_size=32, intermediate_size=32, num_heads=2,
            in_channels=3, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, out_hidden_size=64, fullatt_block_indexes=[],
        ),
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()

    my_cfg = QwenTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=1000000.0)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = convert_qwen_state_dict(sd, dtype=jnp.float32)
    return model, my_cfg, params


def test_qwen_hidden_states_parity(tiny_qwen):
    model, cfg, params = tiny_qwen
    rng = np.random.RandomState(0)
    B, L = 2, 11
    ids = rng.randint(0, 128, size=(B, L))
    mask = np.ones((B, L), np.int64)
    mask[1, 8:] = 0  # right padding on sample 1

    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            return_dict=True, output_hidden_states=True,
        )["hidden_states"][-1].numpy()

    mine = np.asarray(qwen_hidden_states(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask).astype(bool)))
    # compare only valid positions (padded positions differ by HF's
    # position-id handling but are masked downstream)
    for b in range(B):
        valid = int(mask[b].sum())
        np.testing.assert_allclose(mine[b, :valid], out[b, :valid],
                                   rtol=2e-4, atol=2e-4)


def test_qwen_greedy_generate_parity(tiny_qwen):
    model, cfg, params = tiny_qwen
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 128, size=(1, 7))

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(ids), max_new_tokens=8,
            do_sample=False, use_cache=True,
            pad_token_id=0).numpy()[0, 7:]

    mine = qwen_generate_greedy(params, cfg, ids, max_new_tokens=8,
                                eos_token_ids=())
    n = min(len(mine), len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPTextConfig, CLIPTextModel

    # eos_token_id=2 selects the legacy argmax pooling branch — the
    # behavior of the real openai/clip-vit-large-patch14 checkpoint
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=2)
    torch.manual_seed(0)
    model = CLIPTextModel(cfg).eval()
    my_cfg = ClipTextConfig(vocab_size=99, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=4)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = convert_clip_state_dict(sd, dtype=jnp.float32)
    return model, my_cfg, params


def test_clip_pooled_parity(tiny_clip):
    model, cfg, params = tiny_clip
    rng = np.random.RandomState(2)
    B, L = 2, 12
    # ids below the "EOT" id; put EOT (max id 98) at the true end + pads
    ids = rng.randint(1, 90, size=(B, L))
    ids[0, 9:] = 98
    ids[1, 6:] = 98
    mask = np.ones((B, L), np.int64)
    mask[0, 10:] = 0
    mask[1, 7:] = 0

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))
    ref_pooled = out["pooler_output"].numpy()
    ref_hidden = out["last_hidden_state"].numpy()

    hidden, pooled = clip_text_forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=2e-4, atol=2e-4)
    for b in range(B):
        valid = int(mask[b].sum())
        np.testing.assert_allclose(np.asarray(hidden)[b, :valid],
                                   ref_hidden[b, :valid], rtol=2e-4, atol=2e-4)
