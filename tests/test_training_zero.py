"""ZeRO-1 optimizer-state sharding (training.shard_train_state)."""

import numpy as np

import jax
import jax.numpy as jnp

from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.dit import init_dit_params
from kandinsky5_tpu.parallel.sharding import (
    make_mesh,
    shard_dit_params,
    sharding_ctx,
)
from kandinsky5_tpu.training import (
    init_train_state,
    make_optimizer,
    shard_train_state,
    train_step,
)


def _setup():
    cfg = DiTParams(
        in_visual_dim=4, out_visual_dim=4, in_text_dim=32, in_text_dim2=16,
        time_dim=32, patch_size=(1, 2, 2), model_dim=128, ff_dim=256,
        num_text_blocks=1, num_visual_blocks=2, axes_dims=(8, 4, 4),
        visual_cond=False,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    b, L = 4, 8
    x0 = jnp.asarray(rng.randn(b, 2, 8, 8, 4), jnp.float32)
    te = jnp.asarray(rng.randn(b, L, cfg.in_text_dim), jnp.float32)
    pe = jnp.asarray(rng.randn(b, cfg.in_text_dim2), jnp.float32)
    m = jnp.ones((b, L), bool)
    return cfg, params, (x0, te, pe, m)


def test_zero_sharded_step_matches_unsharded():
    cfg, params, batch = _setup()
    opt = make_optimizer(lr=1e-4)

    state = init_train_state(params, opt)
    ref_state, ref_loss = train_step(state, cfg, opt, *batch,
                                     jax.random.PRNGKey(5),
                                     attn_impl="dense")

    mesh = make_mesh(n_devices=8, dp=2)
    sp = shard_dit_params(params, mesh)
    sstate = shard_train_state(init_train_state(sp, opt), mesh)

    # moments actually shard over dp somewhere
    mus = [l for l in jax.tree.leaves(sstate.opt_state)
           if hasattr(l, "sharding") and l.ndim >= 2]
    assert any("dp" in (l.sharding.spec or ()) for l in mus), \
        [l.sharding.spec for l in mus[:5]]

    with sharding_ctx(mesh):
        out_state, loss = train_step(sstate, cfg, opt, *batch,
                                     jax.random.PRNGKey(5),
                                     attn_impl="dense")
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)
    # a step on the sharded state matches the unsharded parameters
    for a, b in zip(jax.tree.leaves(out_state.params)[:8],
                    jax.tree.leaves(ref_state.params)[:8]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_train_state_checkpoint_roundtrip(tmp_path):
    """Full-TrainState orbax save/restore: resumed training continues
    bit-identically to an uninterrupted run."""
    from kandinsky5_tpu.training import load_train_state, save_train_state

    cfg, params, batch = _setup()
    opt = make_optimizer(lr=1e-4)
    state = init_train_state(params, opt)

    # two steps uninterrupted
    s1, _ = train_step(state, cfg, opt, *batch, jax.random.PRNGKey(5),
                       attn_impl="dense")
    s2_ref, loss_ref = train_step(s1, cfg, opt, *batch,
                                  jax.random.PRNGKey(6), attn_impl="dense")

    # save after step 1, restore into a fresh skeleton, take step 2
    save_train_state(s1, str(tmp_path / "ckpt"), step=1)
    skeleton = init_train_state(params, opt)
    restored = load_train_state(str(tmp_path / "ckpt"), skeleton)
    assert int(restored.step) == 1
    s2, loss = train_step(restored, cfg, opt, *batch,
                          jax.random.PRNGKey(6), attn_impl="dense")
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(s2.params)[:6],
                    jax.tree.leaves(s2_ref.params)[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
