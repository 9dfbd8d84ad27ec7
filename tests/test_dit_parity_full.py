"""Full-2B-architecture golden parity vs the torch reference (CPU, fp32).

The tiny-config parity tests (test_dit_parity.py) cannot catch
dim-dependent slips — RoPE axis splits (16/24/24), 28-head packing,
1792/7168 projection transposes. This runs ONE forward through all 32
visual + 2 text blocks at the released 2B dimensions (reference
dit.py:155-181, utils.py:143-156) on a reduced 2x8x12-token grid, with
the random torch state round-tripped through convert_dit_state_dict —
so any weight-mapping or forward-math bug at real dims fails here.

Heavy (three 8 GB fp32 param copies + a ~1 TFLOP forward per side on
the 1-core CI host, ~3-5 min) — keep it last in the file ordering and
run it with the normal suite; it is the only full-dims fidelity gate
available without real checkpoints.
"""

import gc

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from kandinsky5_tpu.checkpoint import convert_dit_state_dict
from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.dit import dit_forward

from .ref import load_reference_models, torch_state_to_numpy

FULL_2B = dict(
    in_visual_dim=16,
    out_visual_dim=16,
    time_dim=512,
    patch_size=[1, 2, 2],
    model_dim=1792,
    ff_dim=7168,
    num_text_blocks=2,
    num_visual_blocks=32,
    axes_dims=[16, 24, 24],
    visual_cond=True,
    in_text_dim=3584,
    in_text_dim2=768,
)


@pytest.mark.slow
def test_full_2b_forward_matches_reference():
    _, rdit, _ = load_reference_models()
    torch.manual_seed(0)
    ref = rdit.get_dit(dict(FULL_2B))
    ref.eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "modulation" in name:
                p.copy_(torch.randn_like(p) * 0.02)

    cfg = DiTParams()
    assert (cfg.model_dim, cfg.ff_dim, cfg.num_visual_blocks) == (1792, 7168, 32)
    params = convert_dit_state_dict(torch_state_to_numpy(ref), cfg,
                                    dtype=jnp.float32)

    T, H, W = 2, 16, 24  # -> 2x8x12 = 192 visual tokens at patch (1,2,2)
    cin = cfg.visual_embed_dim
    rng = np.random.RandomState(1)
    x = rng.randn(T, H, W, cin).astype(np.float32)
    L = 7
    text = rng.randn(L, cfg.in_text_dim).astype(np.float32)
    pooled = rng.randn(1, cfg.in_text_dim2).astype(np.float32)
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
    del ref
    gc.collect()

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
    # fp32 end-to-end through 32 blocks at 1792 dims: reduction-order
    # differences accumulate to ~1e-4 relative; 1e-3 is the VERDICT-
    # prescribed gate that still fails hard on any structural slip
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)
