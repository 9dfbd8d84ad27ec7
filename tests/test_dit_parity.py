"""Golden-activation parity: JAX DiT vs the PyTorch reference on CPU.

Both sides run float32 on tiny shapes; weights are converted through
checkpoint.convert_dit_state_dict, so this covers the full weight-mapping
+ forward-math contract (SURVEY.md §7 step 2)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky5_tpu.checkpoint import convert_dit_state_dict, dit_params_to_state_dict
from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.dit import dit_forward, init_dit_params, param_count

from .ref import TINY, TINY_COND, load_reference_models, torch_state_to_numpy


def _to_cfg(d) -> DiTParams:
    return DiTParams(
        in_visual_dim=d["in_visual_dim"],
        out_visual_dim=d["out_visual_dim"],
        time_dim=d["time_dim"],
        patch_size=tuple(d["patch_size"]),
        model_dim=d["model_dim"],
        ff_dim=d["ff_dim"],
        num_text_blocks=d["num_text_blocks"],
        num_visual_blocks=d["num_visual_blocks"],
        axes_dims=tuple(d["axes_dims"]),
        visual_cond=d["visual_cond"],
        in_text_dim=d["in_text_dim"],
        in_text_dim2=d["in_text_dim2"],
    )


@pytest.mark.parametrize("tiny", [TINY, TINY_COND], ids=["plain", "visual_cond"])
def test_dit_forward_matches_reference(tiny):
    _, rdit, _ = load_reference_models()
    torch.manual_seed(0)
    ref = rdit.get_dit(dict(tiny))
    # randomize modulation weights too (they are zero-init -> would hide
    # AdaLN wiring bugs)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "modulation" in name:
                p.copy_(torch.randn_like(p) * 0.02)

    cfg = _to_cfg(tiny)
    params = convert_dit_state_dict(torch_state_to_numpy(ref), cfg, dtype=jnp.float32)

    T, H, W = 4, 8, 8
    cin = cfg.visual_embed_dim
    rng = np.random.RandomState(1)
    x = rng.randn(T, H, W, cin).astype(np.float32)
    L = 7
    text = rng.randn(L, tiny["in_text_dim"]).astype(np.float32)
    pooled = rng.randn(1, tiny["in_text_dim2"]).astype(np.float32)
    t = np.array([417.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(text),
            torch.from_numpy(pooled),
            torch.from_numpy(t),
            [torch.arange(T), torch.arange(H // 2), torch.arange(W // 2)],
            torch.arange(L),
            scale_factor=(1.0, 2.0, 2.0),
        ).numpy()

    out = dit_forward(
        params, cfg,
        jnp.asarray(x)[None],
        jnp.asarray(text)[None],
        jnp.asarray(pooled),
        jnp.asarray(t),
        text_mask=jnp.ones((1, L), bool),
        scale_factor=(1.0, 2.0, 2.0),
        attn_impl="dense",
    )
    out = np.asarray(out[0])

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-4)


def test_param_count_matches_reference_2b():
    """Full-size config must reproduce the released checkpoint's exact
    parameter count (SURVEY.md Appendix A: 2,007,702,848 in 814 tensors)."""
    cfg = DiTParams()
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    assert param_count(params) == 2_007_702_848
    sd = dit_params_to_state_dict(params)
    assert len(sd) == 814


def test_state_dict_round_trip():
    cfg = _to_cfg(TINY)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sd = dit_params_to_state_dict(params)
    back = convert_dit_state_dict(sd, cfg, dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_forward_equals_two_singles():
    """CFG batching correctness: a batch-2 forward must equal two
    independent batch-1 forwards (this is the freedom we exploit to fuse
    the reference's two sequential CFG calls)."""
    cfg = _to_cfg(TINY)
    params = init_dit_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    T, H, W = 2, 8, 8
    x = rng.randn(2, T, H, W, cfg.in_visual_dim).astype(np.float32)
    text = rng.randn(2, 5, cfg.in_text_dim).astype(np.float32)
    pooled = rng.randn(2, cfg.in_text_dim2).astype(np.float32)
    t = np.array([500.0, 500.0], dtype=np.float32)
    mask = np.ones((2, 5), bool)

    both = dit_forward(params, cfg, jnp.asarray(x), jnp.asarray(text),
                       jnp.asarray(pooled), jnp.asarray(t),
                       text_mask=jnp.asarray(mask), attn_impl="dense")
    for i in range(2):
        single = dit_forward(params, cfg, jnp.asarray(x[i:i+1]),
                             jnp.asarray(text[i:i+1]), jnp.asarray(pooled[i:i+1]),
                             jnp.asarray(t[i:i+1]),
                             text_mask=jnp.asarray(mask[i:i+1]),
                             attn_impl="dense")
        np.testing.assert_allclose(np.asarray(both[i]), np.asarray(single[0]),
                                   rtol=1e-5, atol=1e-5)


def test_text_padding_invariance():
    """Padded text tokens must not change the output (mask correctness —
    replaces the reference's varlen packing guarantee)."""
    cfg = _to_cfg(TINY)
    params = init_dit_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    T, H, W = 2, 8, 8
    x = rng.randn(1, T, H, W, cfg.in_visual_dim).astype(np.float32)
    text = rng.randn(1, 6, cfg.in_text_dim).astype(np.float32)
    pooled = rng.randn(1, cfg.in_text_dim2).astype(np.float32)
    t = np.array([100.0], dtype=np.float32)

    out_exact = dit_forward(params, cfg, jnp.asarray(x), jnp.asarray(text),
                            jnp.asarray(pooled), jnp.asarray(t),
                            text_mask=jnp.ones((1, 6), bool), attn_impl="dense")
    padded = np.concatenate([text, rng.randn(1, 4, cfg.in_text_dim).astype(np.float32)], axis=1)
    mask = np.concatenate([np.ones((1, 6), bool), np.zeros((1, 4), bool)], axis=1)
    out_pad = dit_forward(params, cfg, jnp.asarray(x), jnp.asarray(padded),
                          jnp.asarray(pooled), jnp.asarray(t),
                          text_mask=jnp.asarray(mask), attn_impl="dense")
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_exact),
                               rtol=1e-5, atol=1e-5)
