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


def test_logits_processing_matches_hf():
    """Sampling-mode logits pipeline (repetition penalty -> temperature
    -> top-k -> top-p) vs the HF LogitsProcessors the reference's
    model.generate applies implicitly (t2v_pipeline.py:76-78)."""
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor,
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    from kandinsky5_tpu.text.qwen import _process_logits

    rng = np.random.RandomState(0)
    V = 97
    logits = rng.randn(1, V).astype(np.float32) * 3.0
    seen = np.array([3, 5, 5, 40, 96])
    temperature, top_p, top_k, rep = 0.7, 0.8, 20, 1.05

    t_scores = torch.from_numpy(logits.copy())
    t_ids = torch.from_numpy(seen[None])
    t_scores = RepetitionPenaltyLogitsProcessor(rep)(t_ids, t_scores)
    t_scores = TemperatureLogitsWarper(temperature)(t_ids, t_scores)
    t_scores = TopKLogitsWarper(top_k)(t_ids, t_scores)
    t_scores = TopPLogitsWarper(top_p)(t_ids, t_scores)
    ref = t_scores.numpy()

    presence = jnp.zeros((V,), bool).at[jnp.asarray(seen)].set(True)
    mine = np.asarray(_process_logits(
        jnp.asarray(logits), presence, temperature=temperature,
        top_p=top_p, top_k=top_k, rep_penalty=rep))

    fin = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(mine), fin)
    np.testing.assert_allclose(mine[fin], ref[fin], rtol=1e-5, atol=1e-5)


def test_sampling_decode_seeded_and_greedy_default(tiny_qwen):
    """qwen_generate: greedy default unchanged; seeded sampling is
    reproducible and differs across seeds at high temperature."""
    model, my_cfg, params = tiny_qwen
    rng = np.random.RandomState(7)
    ids = rng.randint(0, my_cfg.vocab_size, (1, 9))

    from kandinsky5_tpu.text.qwen import qwen_generate, qwen_generate_greedy

    g1 = qwen_generate_greedy(params, my_cfg, ids, max_new_tokens=8,
                              eos_token_ids=(my_cfg.vocab_size - 1,))
    g2 = qwen_generate(params, my_cfg, ids, max_new_tokens=8,
                       eos_token_ids=(my_cfg.vocab_size - 1,))
    np.testing.assert_array_equal(g1, g2)

    s1 = qwen_generate(params, my_cfg, ids, max_new_tokens=8,
                       eos_token_ids=(my_cfg.vocab_size - 1,),
                       do_sample=True, temperature=3.0, seed=1)
    s1b = qwen_generate(params, my_cfg, ids, max_new_tokens=8,
                        eos_token_ids=(my_cfg.vocab_size - 1,),
                        do_sample=True, temperature=3.0, seed=1)
    s2 = qwen_generate(params, my_cfg, ids, max_new_tokens=8,
                       eos_token_ids=(my_cfg.vocab_size - 1,),
                       do_sample=True, temperature=3.0, seed=2)
    np.testing.assert_array_equal(s1, s1b)
    assert not (len(s1) == len(s2) and np.array_equal(s1, s2))


def test_int8_decode_quantization(tiny_qwen):
    """Opt-in int8 decode weights: prefill logits stay close to bf16
    (per-output-channel symmetric quantization; expansion-only path)."""
    _, my_cfg, params = tiny_qwen
    from kandinsky5_tpu.text.qwen import _prefill, quantize_qwen_decode_params

    qparams = quantize_qwen_decode_params(params)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(0, my_cfg.vocab_size, (1, 11)), jnp.int32)
    _, logits = _prefill(params, my_cfg, ids, 16)
    _, logits_q = _prefill(qparams, my_cfg, ids, 16)
    a, b = np.asarray(logits), np.asarray(logits_q)
    denom = max(float(np.abs(a).max()), 1e-6)
    rel = float(np.abs(a - b).max()) / denom
    print(f"int8 prefill logits max rel err: {rel:.4f}")
    assert rel < 0.05
