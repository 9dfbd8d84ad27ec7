"""Quantify the TPU NABLA mask deviations against exact reference
semantics (VERDICT round-2 item 6: the deviation must be a number, not a
docstring claim).

Exact semantics = per-row top-CDF by sort, no density cap, q_rows=1
(reference models/utils.py:136-163). The production TPU path uses
threshold bisection + a worst-case density cap + 8-row bank pooling;
each deviation is measured here as mask IoU and attention-output delta
on a *peaked* attention distribution (the released checkpoints' regime:
~5-15% kept density)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky5_tpu.ops.nabla import (
    BLOCK,
    _attention_map,
    group_union_mask,
    masked_block_attention_xla,
    nabla_block_mask,
    sta_mask,
)

S1 = 64  # (4, 4, 4) tile grid
S = S1 * BLOCK
H = 2
D = 64


@pytest.fixture(scope="module")
def peaked_qk():
    """Q/K whose block-pooled attention is peaked (~10-15% of blocks
    carry the top-CDF mass) and BANK-COHERENT: blocks of one 8-block
    bank share a cluster direction — the structure real NABLA masks
    have (a bank is 8 spatially-adjacent fractal tiles whose attention
    targets coincide)."""
    rng = np.random.RandomState(0)
    n_clusters = 8
    centers = rng.randn(n_clusters, H, D).astype(np.float32)
    assign = (np.arange(S1) // 8) % n_clusters  # one cluster per bank
    qb = centers[assign] * 3.0 + rng.randn(S1, H, D).astype(np.float32) * 0.2
    kb = centers[assign] * 3.0 + rng.randn(S1, H, D).astype(np.float32) * 0.2
    q = np.repeat(qb, BLOCK, axis=0) + rng.randn(S, H, D).astype(np.float32) * 0.05
    k = np.repeat(kb, BLOCK, axis=0) + rng.randn(S, H, D).astype(np.float32) * 0.05
    return jnp.asarray(q[None]), jnp.asarray(k[None])


@pytest.fixture(scope="module")
def sta():
    return jnp.asarray(sta_mask(4, 4, 4))


# the STA union dominates mask density at test-scale grids (a (11,3,3)
# window covers most of a (4,4,4) grid); the *adaptive* deviations are
# measured with STA off so the numbers reflect the adaptive criterion
STA_OFF = jnp.zeros((S1, S1), bool)


def _iou(a, b):
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    return float((a & b).sum()) / max(1, float((a | b).sum()))


def test_bisect_equals_sort(peaked_qk, sta):
    """Threshold bisection finds the same kept set as the reference's
    sort (up to fp ties on a measure-zero set)."""
    q, k = peaked_qk
    m_sort = nabla_block_mask(q, k, sta, method="sort")
    m_bis = nabla_block_mask(q, k, sta, method="bisect")
    iou = _iou(m_sort, m_bis)
    print(f"bisect-vs-sort mask IoU: {iou:.6f}")
    assert iou > 0.999


def test_density_cap_inert_when_peaked(peaked_qk):
    """At realistic (peaked) densities the 0.75 cap keeps the mask
    bit-identical; it only engages on near-uniform rows."""
    q, k = peaked_qk
    m_nocap = nabla_block_mask(q, k, STA_OFF, max_density=None)
    m_cap = nabla_block_mask(q, k, STA_OFF, max_density=0.75)
    assert _iou(m_nocap, m_cap) == 1.0
    density = float(np.asarray(m_nocap).mean())
    print(f"peaked adaptive-mask density: {density:.3f}")
    assert density < 0.4  # the fixture really is in the sparse regime


def test_density_cap_engages_on_uniform():
    """Uniform attention (the random-weight worst case) is truncated to
    the cap (+ the STA union, which is never dropped)."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, S, H, D).astype(np.float32) * 0.01)
    k = jnp.asarray(rng.randn(1, S, H, D).astype(np.float32) * 0.01)
    sta_off = jnp.zeros((S1, S1), bool)
    m = nabla_block_mask(q, k, sta_off, max_density=0.5)
    density = float(np.asarray(m).mean())
    print(f"uniform-map capped density: {density:.3f}")
    assert density <= 0.5 + 1.0 / S1


def test_bank_union_deviation(peaked_qk, sta):
    """q_rows=8 bank pooling vs exact per-row masks: IoU + end-to-end
    attention output delta. The bank's STA part is the exact union of
    its rows (strict superset); the adaptive part pools queries 8x —
    measured on the bank-coherent peaked fixture (the regime the banked
    mode is designed for)."""
    q, k = peaked_qk
    m_exact = nabla_block_mask(q, k, STA_OFF, method="sort",
                               max_density=None)
    g = nabla_block_mask(q, k, STA_OFF, method="bisect", q_rows=8,
                         max_density=0.75)
    m_banked = jnp.repeat(g, 8, axis=2)
    iou = _iou(m_exact, m_banked)

    # superset check for the STA part alone
    sta_bank = jnp.repeat(
        sta.reshape(S1 // 8, 8, S1).any(axis=1), 8, axis=0)
    assert bool(jnp.all(sta_bank >= sta))

    v = jax.random.normal(jax.random.PRNGKey(2), (1, S, H, D), jnp.float32)
    out_exact = np.asarray(masked_block_attention_xla(q, k, v, m_exact))
    out_banked = np.asarray(masked_block_attention_xla(q, k, v, m_banked))
    scale = float(np.abs(out_exact).max())
    delta = float(np.abs(out_exact - out_banked).max()) / scale
    print(f"bank-union IoU: {iou:.3f}; output max rel delta: {delta:.4f}")
    # pooled statistics track per-row ones closely when banks are
    # coherent; incoherent banks degrade toward the full-row union
    assert iou > 0.8
    assert delta < 0.2


def test_parity_mode_is_exact(peaked_qk, sta):
    """The production entry point in parity mode (q_rows=1, sort, no
    cap) reproduces the reference mask bit-for-bit."""
    q, k = peaked_qk
    ref = nabla_block_mask(q, k, sta, method="sort", q_rows=1,
                           max_density=None)
    from kandinsky5_tpu.ops.nabla import nabla_build_mask

    m = nabla_build_mask(q, k, sta, q_rows=1, max_density=None,
                         method="sort")
    assert m.q_rows == 1
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(m.gmask))


def test_attention_map_matches_pooled_reference(peaked_qk):
    """_attention_map: mean-pool both sides over 64-token blocks +
    softmax(QK/sqrt(D)) — checked against a direct einsum."""
    q, k = peaked_qk
    amap = _attention_map(q, k)
    qa = np.asarray(q).reshape(1, S1, BLOCK, H, D).mean(axis=2)
    ka = np.asarray(k).reshape(1, S1, BLOCK, H, D).mean(axis=2)
    s = np.einsum("bihd,bjhd->bhij", qa, ka) / np.sqrt(D)
    e = np.exp(s - s.max(axis=-1, keepdims=True))
    ref = e / e.sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(amap), ref, rtol=2e-4, atol=2e-5)


def test_sharded_sparse_matches_xla(peaked_qk, sta):
    """_sparse_attention_sharded (heads over tp, q banks over sp with
    KV all-gather, interpret-mode kernel) == the XLA masked reference —
    including the odd-bank-count padding path (rows % sp != 0)."""
    from kandinsky5_tpu.ops.nabla import (
        _sparse_attention_sharded,
        nabla_build_mask,
    )
    from kandinsky5_tpu.parallel.sharding import make_mesh

    q, k = peaked_qk
    v = jax.random.normal(jax.random.PRNGKey(9), (1, S, H, D), jnp.float32)
    m = nabla_build_mask(q, k, sta, q_rows=8)
    ref = masked_block_attention_xla(q, k, v,
                                     jnp.repeat(m.gmask, 8, axis=2))

    mesh = make_mesh(n_devices=4, dp=1, sp=2)  # tp=2; 8 banks -> 4/sp
    out = _sparse_attention_sharded(q, k, v, m, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    # bank-count padding path: sp=3 does not divide the 8 banks, so the
    # wrapper pads a zero-count bank row and slices its q tokens off
    mesh3 = make_mesh(n_devices=6, dp=1, sp=3)  # tp=2
    out_pad = _sparse_attention_sharded(q, k, v, m, mesh3, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
