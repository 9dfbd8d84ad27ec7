"""Tensor-parallel denoise == single-device denoise, numerically.

The reference validates its distributed story only by running torchrun
over 1/2/4 GPUs (/root/reference/README.md:269-276; DTensor plan in
kandinsky/models/parallelize.py:11-102). Here the equivalent check runs
single-process on the virtual 8-CPU mesh: the TP/SP-sharded denoise
must produce the same latents as the unsharded one, and the compiled
module must actually contain collectives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.dit import dit_forward, init_dit_params
from kandinsky5_tpu.parallel.sharding import (
    make_mesh,
    shard_dit_params,
    sharding_ctx,
)
from kandinsky5_tpu.sampling import DenoiseSpec, denoise


def _setup():
    cfg = DiTParams(
        in_visual_dim=4, out_visual_dim=4, in_text_dim=32, in_text_dim2=16,
        time_dim=32, patch_size=(1, 2, 2), model_dim=128, ff_dim=256,
        num_text_blocks=1, num_visual_blocks=2, axes_dims=(8, 4, 4),
        visual_cond=False,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # zero-init modulation makes every block an identity; randomize so
    # the TP-sharded tensors actually participate
    for blocks, mod in (("text_transformer_blocks", "text_modulation"),
                        ("visual_transformer_blocks", "visual_modulation")):
        w = params[blocks][mod]["out_layer"]["weight"]
        params[blocks][mod]["out_layer"]["weight"] = (
            jax.random.normal(jax.random.PRNGKey(7), w.shape, w.dtype) * 0.05)

    rng = np.random.RandomState(0)
    L = 8
    noise = jnp.asarray(rng.randn(1, 2, 8, 8, cfg.in_visual_dim), jnp.float32)
    cond = dict(
        text_embeds=jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.float32),
        pooled_embed=jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32),
        mask=jnp.ones((1, L), bool),
    )
    uncond = dict(
        text_embeds=jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.float32),
        pooled_embed=jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.float32),
        mask=jnp.ones((1, L), bool),
    )
    return cfg, params, noise, cond, uncond


def _run(cfg, params, noise, cond, uncond, mesh=None):
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=2, guidance_weight=5.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0), attn_impl="dense")
    skip = jnp.zeros((spec.num_steps, 2), bool)
    with sharding_ctx(mesh):
        out = denoise(params, spec, noise,
                      cond["text_embeds"], cond["pooled_embed"], cond["mask"],
                      uncond["text_embeds"], uncond["pooled_embed"],
                      uncond["mask"], skip)
    return np.asarray(out)


@pytest.mark.parametrize("dp", [1, 2])
def test_tp_denoise_matches_single(dp):
    cfg, params, noise, cond, uncond = _setup()
    base = _run(cfg, params, noise, cond, uncond, mesh=None)

    mesh = make_mesh(n_devices=8, dp=dp)
    sharded = shard_dit_params(params, mesh)
    out = _run(cfg, sharded, noise, cond, uncond, mesh=mesh)
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-5)


def test_tp_forward_compiles_collectives():
    cfg, params, noise, cond, uncond = _setup()
    mesh = make_mesh(n_devices=8, dp=2)
    sharded = shard_dit_params(params, mesh)

    def fwd(p, x, te, pe, t, m):
        return dit_forward(p, cfg, x, te, pe, t, text_mask=m,
                           scale_factor=(1.0, 2.0, 2.0), attn_impl="dense")

    t = jnp.full((1,), 500.0, jnp.float32)
    with sharding_ctx(mesh):
        compiled = (jax.jit(fwd)
                    .lower(sharded, noise, cond["text_embeds"],
                           cond["pooled_embed"], t, cond["mask"])
                    .compile())
    hlo = compiled.as_text()
    assert ("all-reduce" in hlo or "reduce-scatter" in hlo
            or "all-gather" in hlo), "TP plan compiled without collectives"


def test_hybrid_mesh_dp_over_hosts_matches_single():
    """Multi-host growth path: dp spans (emulated) hosts over DCN while
    tp stays within each host's ICI; numerics must match the unsharded
    run and every tp row must sit inside one host group."""
    from kandinsky5_tpu.parallel.sharding import make_hybrid_mesh

    cfg, params, noise, cond, uncond = _setup()
    base = _run(cfg, params, noise, cond, uncond, mesh=None)

    # emulate 2 hosts x 4 devices on the virtual 8-CPU mesh
    host_of = lambda d: d.id // 4  # noqa: E731
    mesh = make_hybrid_mesh(tp=4, dp_ici=1, host_index_fn=host_of)
    assert mesh.shape == {"dp": 2, "tp": 4}
    arr = np.asarray(mesh.devices, dtype=object)
    for row in arr:  # each tp row must not cross a host boundary
        assert len({host_of(d) for d in row}) == 1

    sharded = shard_dit_params(params, mesh)
    out = _run(cfg, sharded, noise, cond, uncond, mesh=mesh)
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-5)


def test_hybrid_mesh_with_in_slice_dp():
    """dp_ici > 1 (spare per-host chips become in-slice dp, as the
    pipeline factory now sizes it): 2 hosts x (dp_ici=2 x tp=2) ->
    (dp=4, tp=2); numerics match unsharded."""
    from kandinsky5_tpu.parallel.sharding import make_hybrid_mesh

    cfg, params, noise, cond, uncond = _setup()
    base = _run(cfg, params, noise, cond, uncond, mesh=None)

    host_of = lambda d: d.id // 4  # noqa: E731
    mesh = make_hybrid_mesh(tp=2, dp_ici=2, host_index_fn=host_of)
    assert mesh.shape == {"dp": 4, "tp": 2}
    arr = np.asarray(mesh.devices, dtype=object)
    for row in arr:  # tp rows still never cross a host
        assert len({host_of(d) for d in row}) == 1

    sharded = shard_dit_params(params, mesh)
    out = _run(cfg, sharded, noise, cond, uncond, mesh=mesh)
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("dp,sp", [(1, 2), (2, 2)])
def test_sp_sharded_attention_denoise_matches_single(dp, sp):
    """The shard_map attention decomposition (heads x SEQUENCE x batch,
    ops/attention._sharded_attention — the v5e-8 production layout where
    28 heads don't divide 8 chips) must be numerically identical to the
    unsharded run."""
    cfg, params, noise, cond, uncond = _setup()
    base = _run(cfg, params, noise, cond, uncond, mesh=None)

    mesh = make_mesh(n_devices=8, dp=dp, sp=sp)
    assert mesh.shape["sp"] == sp and mesh.shape["tp"] == 8 // (dp * sp)
    sharded = shard_dit_params(params, mesh)
    out = _run(cfg, sharded, noise, cond, uncond, mesh=mesh)
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-5)


def test_plan_dit_mesh_28_heads():
    """8 devices with 28 heads -> tp=4 (whole heads) x sp=2 (sequence)."""
    from kandinsky5_tpu.parallel.sharding import plan_dit_mesh

    mesh = plan_dit_mesh(8, num_heads=28)
    assert dict(mesh.shape) == {"dp": 1, "sp": 2, "tp": 4}
    mesh = plan_dit_mesh(8, num_heads=8)
    assert dict(mesh.shape) == {"dp": 1, "sp": 1, "tp": 8}
    mesh = plan_dit_mesh(8, num_heads=28, dp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 1, "tp": 4}


def test_int8_mesh_matches_single_device():
    """flash_int8 as a first-class MESH option: the int8-QK Pallas
    kernel running per shard inside _sharded_attention (heads over tp,
    query sequence over sp, KV all-gathered) must produce exactly the
    single-device kernel's output — this is the path a mesh pipeline
    takes under KANDINSKY5_TPU_ATTN=flash_int8 (pipeline.
    default_attn_impl), and the configuration the v5e-8 int8 projection
    cites. Runs the real kernel math via Pallas interpret mode on the
    virtual CPU mesh (d=64: the int8 fixed-shift layout)."""
    from kandinsky5_tpu.ops.attention import _attention_local, attention

    rng = np.random.RandomState(3)
    B, L, H, D = 1, 256, 4, 64
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16) * 0.5
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16) * 0.5
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)

    from kandinsky5_tpu.ops.attention import dense_attention

    base = np.asarray(_attention_local(q, k, v, None, "flash_int8"),
                      np.float32)
    dense = np.asarray(dense_attention(q, k, v), np.float32)
    mesh = make_mesh(n_devices=4, sp=2)  # tp=2 x sp=2
    with sharding_ctx(mesh):
        out = np.asarray(attention(q, k, v, impl="flash_int8"), np.float32)
    # per-SHARD query quantization scales differ from the single-device
    # global ones (finer granularity), so outputs agree to int8
    # resolution rather than bitwise
    np.testing.assert_allclose(out, base, atol=5e-3)
    np.testing.assert_allclose(out, dense, atol=0.05)

    # cross-attention (text keys + mask): K/V stay whole per device
    Lk = 64
    kc = jnp.asarray(rng.randn(B, Lk, H, D), jnp.bfloat16) * 0.5
    vc = jnp.asarray(rng.randn(B, Lk, H, D), jnp.bfloat16)
    mask = jnp.asarray(rng.rand(B, Lk) > 0.3)
    base = np.asarray(_attention_local(q, kc, vc, mask, "flash_int8"),
                      np.float32)
    with sharding_ctx(mesh):
        out = np.asarray(attention(q, kc, vc, kv_mask=mask,
                                   impl="flash_int8"), np.float32)
    np.testing.assert_allclose(out, base, atol=5e-3)
