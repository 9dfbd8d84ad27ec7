"""Unit tests: fractal reorder, STA/NABLA masks, RoPE, attention ops."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky5_tpu.ops.attention import dense_attention
from kandinsky5_tpu.ops.fractal import (
    fractal_flatten,
    fractal_inverse_permutation,
    fractal_permutation,
)
from kandinsky5_tpu.ops.nabla import (
    BLOCK,
    block_mask_to_kv_lists,
    masked_block_attention_xla,
    nabla_block_mask,
    sta_mask,
)
from kandinsky5_tpu.models.nn import apply_rotary, rope_1d, rope_3d

from .ref import load_reference_models


def test_fractal_matches_reference_local_patching():
    """Our precomputed permutation must equal the reference's
    view/permute pipeline (models/utils.py:31-78)."""
    _, _, rutils = load_reference_models()
    t, h, w = 3, 16, 24
    x = torch.arange(t * h * w * 5, dtype=torch.float32).reshape(t, h, w, 5)
    ref_flat, _ = rutils.fractal_flatten(x, x.clone(), (t, h, w), block_mask=True)
    flat = jnp.asarray(x.numpy()).reshape(1, t * h * w, 5)
    mine = fractal_flatten(flat, (t, h, w))[0]
    np.testing.assert_array_equal(np.asarray(mine), ref_flat.numpy())

    ref_back = rutils.fractal_unflatten(ref_flat, (t, h, w), block_mask=True)
    np.testing.assert_array_equal(ref_back.numpy(), x.numpy())


def test_fractal_round_trip():
    grid = (5, 8, 16)
    perm = fractal_permutation(grid)
    inv = fractal_inverse_permutation(grid)
    assert np.array_equal(perm[inv], np.arange(np.prod(grid)))
    assert np.array_equal(np.sort(perm), np.arange(np.prod(grid)))


def test_sta_mask_matches_reference():
    _, _, rutils = load_reference_models()
    for (T, H, W, wT, wH, wW) in [(4, 3, 5, 3, 3, 3), (7, 2, 2, 11, 3, 3)]:
        ref = rutils.fast_sta_nabla(T, H, W, wT, wH, wW, device="cpu").numpy()
        mine = sta_mask(T, H, W, wT, wH, wW)
        np.testing.assert_array_equal(mine, ref.astype(bool))


def test_sta_mask_10s_density():
    """SURVEY.md Appendix B: 10s grid (61,4,6) w=(11,3,3) -> 4.79% density."""
    m = sta_mask(61, 4, 6, 11, 3, 3)
    assert m.shape == (1464, 1464)
    assert abs(m.mean() - 0.0479) < 0.001


def test_nabla_mask_matches_reference_flex_blockmask():
    """Adaptive mask parity with reference nablaT_v2
    (models/utils.py:136-163) via the BlockMask kv lists."""
    rnn, _, rutils = load_reference_models()
    rng = np.random.RandomState(0)
    B, H, s1, D = 1, 2, 6, 16
    S = s1 * BLOCK
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    sta = sta_mask(s1, 1, 1, 3, 1, 1)

    # reference path (torch): q/k in (B, h, S, D)
    qt = torch.from_numpy(q).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).permute(0, 2, 1, 3)
    sta_t = torch.from_numpy(sta).unsqueeze(0).unsqueeze(0)
    thr = 0.5  # selective threshold so the mask is non-trivial
    bm = rutils.nablaT_v2(qt, kt, sta_t, thr=thr)
    # reference passes the real counts as *full* kv blocks
    # (models/utils.py:161-163: first arg of from_kv_blocks is zeros)
    ref_counts = bm.full_kv_num_blocks.squeeze(0).numpy()  # (h, s1)

    mask = nabla_block_mask(jnp.asarray(q), jnp.asarray(k), jnp.asarray(sta), thr=thr)
    assert 0 < np.asarray(mask).mean() < 1.0  # non-trivial
    kv_inds, kv_nb = block_mask_to_kv_lists(mask)
    np.testing.assert_array_equal(np.asarray(kv_nb[0]), ref_counts)

    # active sets must match exactly
    ref_inds = bm.full_kv_indices.squeeze(0).numpy()  # (h, s1, s1)
    for h in range(H):
        for r in range(s1):
            n = ref_counts[h, r]
            ref_set = set(ref_inds[h, r, :n].tolist())
            my_set = set(np.asarray(kv_inds[0, h, r, :n]).tolist())
            assert my_set == ref_set


def test_masked_block_attention_equals_dense_when_full():
    rng = np.random.RandomState(1)
    B, S, H, D = 1, 2 * BLOCK, 2, 8
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    full = jnp.ones((B, H, S // BLOCK, S // BLOCK), bool)
    out = masked_block_attention_xla(q, k, v, full)
    ref = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rope_1d_matches_reference():
    rnn, _, _ = load_reference_models()
    dim = 16
    L = 9
    rope_mod = rnn.RoPE1D(dim)
    rope_t = rope_mod(torch.arange(L))  # (L, 1, dim/2, 2, 2)
    x = torch.randn(L, 2, dim)  # (L, heads, dim)
    ref = rnn.apply_rotary(x, rope_t).numpy()

    cos, sin = rope_1d(jnp.arange(L), dim)
    mine = apply_rotary(jnp.asarray(x.numpy()), cos, sin)
    np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-5, atol=1e-5)


def test_rope_3d_matches_reference():
    rnn, _, _ = load_reference_models()
    axes_dims = (8, 4, 4)
    grid = (3, 4, 5)
    sf = (1.0, 2.0, 2.0)
    rope_mod = rnn.RoPE3D(axes_dims)
    pos = [torch.arange(g) for g in grid]
    rope_t = rope_mod(grid, pos, sf)  # (T,H,W,1,D/2,2,2)
    x = torch.randn(*grid, 2, sum(axes_dims))
    ref = rnn.apply_rotary(x, rope_t).numpy().reshape(-1, 2, sum(axes_dims))

    cos, sin = rope_3d(grid, tuple(jnp.arange(g) for g in grid), axes_dims, sf)
    xf = jnp.asarray(x.numpy()).reshape(-1, 2, sum(axes_dims))
    mine = apply_rotary(xf, cos, sin)
    np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-5, atol=1e-5)


def test_dense_attention_kv_mask():
    """Masked dense attention == attention over the unpadded slice."""
    rng = np.random.RandomState(2)
    B, Lq, Lk, H, D = 2, 6, 8, 2, 8
    q = jnp.asarray(rng.randn(B, Lq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    n_valid = 5
    mask = jnp.arange(Lk)[None, :] < n_valid
    mask = jnp.broadcast_to(mask, (B, Lk))
    out = dense_attention(q, k, v, kv_mask=mask)
    ref = dense_attention(q, k[:, :n_valid], v[:, :n_valid])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_nabla_density_cap():
    """max_density bounds the kept fraction per row; with peaked scores
    it keeps the top-valued blocks (top-K semantics)."""
    from kandinsky5_tpu.ops.nabla import nabla_block_mask, sta_mask

    rng = np.random.RandomState(5)
    s1 = 16
    q = jnp.asarray(rng.randn(1, s1 * 64, 2, 16).astype(np.float32))
    # near-identical keys -> near-uniform attention map -> uncapped mask
    # keeps almost everything
    k = jnp.asarray(
        (rng.randn(1, 1, 2, 16) + 0.01 * rng.randn(1, s1 * 64, 2, 16))
        .astype(np.float32))
    sta = jnp.asarray(sta_mask(4, 2, 2, 1, 1, 1))

    dense_mask = nabla_block_mask(q, k, sta, thr=0.95, max_density=None)
    frac_uncapped = float(dense_mask.mean())
    assert frac_uncapped > 0.8  # uniform map: top-CDF keeps ~all blocks

    capped = nabla_block_mask(q, k, sta, thr=0.95, max_density=0.5)
    adaptive_only = capped & ~sta[None, None].astype(bool)
    # per-row kept count (before the STA union) respects the ceiling
    counts = np.asarray(capped.sum(axis=-1))
    assert counts.max() <= int(s1 * 0.5) + int(np.asarray(sta).sum(1).max())
    assert capped.any()


def test_nabla_shared_mask_modes():
    """Shared-mask mode: a precomputed NablaMask reused across calls
    equals building it per call from the same q/k, on both execution
    paths; the full denoise runs finite with the flag on."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.ops.nabla import (
        nabla_attention,
        nabla_build_mask,
        sta_mask,
    )
    from kandinsky5_tpu.ops.sparse_pallas import sparse_attention

    key = jax.random.PRNGKey(9)
    s1 = 16
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (1, s1 * 64, 2, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, s1 * 64, 2, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, s1 * 64, 2, 64), jnp.float32)
    sta = jnp.asarray(sta_mask(4, 2, 2, 3, 3, 3))

    m = nabla_build_mask(q, k, sta, thr=0.5)
    # sparse kernel path (interpret): shared lists == direct lists
    out_shared = sparse_attention(q, k, v, m.kv_inds, m.kv_nb,
                                  q_rows=m.q_rows, interpret=True)
    out_direct = nabla_attention(q, k, v, sta, thr=0.5, shared=m,
                                 impl="dense")
    # the XLA fallback with the shared banked mask must agree with the
    # kernel under the identical mask
    np.testing.assert_allclose(np.asarray(out_shared),
                               np.asarray(out_direct), rtol=2e-4, atol=2e-4)

    # full denoise with the flag on (CPU fallback path)
    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import init_dit_params
    from kandinsky5_tpu.sampling import DenoiseSpec, generate_latents

    cfg = DiTParams(
        in_visual_dim=4, out_visual_dim=4, in_text_dim=32, in_text_dim2=16,
        time_dim=32, patch_size=(1, 2, 2), model_dim=128, ff_dim=256,
        num_text_blocks=1, num_visual_blocks=2, axes_dims=(8, 4, 4),
        visual_cond=False,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=2, guidance_weight=5.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
        attention_type="nabla", nabla_shared_mask=True, attn_impl="dense")
    rng = np.random.RandomState(0)
    cond = dict(
        text_embeds=jnp.asarray(rng.randn(1, 8, cfg.in_text_dim), jnp.float32),
        pooled_embed=jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32),
        mask=jnp.ones((1, 8), bool))
    out = generate_latents(params, spec, (1, 4, 16, 16, 4), cond, cond,
                           seed=1)
    assert np.isfinite(np.asarray(out)).all()
