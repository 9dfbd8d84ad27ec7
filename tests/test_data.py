"""Training data pipeline (kandinsky5_tpu/data.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from kandinsky5_tpu.data import LatentShardLoader, write_shard


def _make_shards(tmp_path, n_shards=3, per_shard=10):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n_shards):
        p = str(tmp_path / f"shard{i}.npz")
        write_shard(
            p,
            rng.randn(per_shard, 2, 8, 8, 4),
            rng.randn(per_shard, 16, 32),
            rng.randn(per_shard, 8),
            np.ones((per_shard, 16), bool),
        )
        paths.append(p)
    return paths


def test_loader_covers_all_samples_once(tmp_path):
    paths = _make_shards(tmp_path)
    loader = LatentShardLoader(paths, batch_size=4, seed=1)
    seen = 0
    for batch in loader.epoch(0):
        assert batch["latents"].shape == (4, 2, 8, 8, 4)
        assert batch["text_embeds"].dtype == jnp.bfloat16
        seen += batch["latents"].shape[0]
    # 30 samples, batch 4, drop_remainder -> 28
    assert seen == 28


def test_loader_deterministic_and_epoch_varies(tmp_path):
    paths = _make_shards(tmp_path)

    def first_batch(epoch):
        loader = LatentShardLoader(paths, batch_size=4, seed=7)
        return np.asarray(next(iter(loader.epoch(epoch)))["latents"],
                          np.float32)

    a, b = first_batch(0), first_batch(0)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(first_batch(0), first_batch(1))


def test_loader_dp_placement_feeds_train_step(tmp_path):
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

    paths = _make_shards(tmp_path)
    mesh = make_mesh(n_devices=8, dp=2)
    loader = LatentShardLoader(paths, batch_size=4, seed=3, mesh=mesh,
                               dtype=jnp.float32)
    batch = next(iter(loader))
    assert "dp" in (batch["latents"].sharding.spec or ())

    cfg = DiTParams(
        in_visual_dim=4, out_visual_dim=4, in_text_dim=32, in_text_dim2=8,
        time_dim=32, patch_size=(1, 2, 2), model_dim=128, ff_dim=256,
        num_text_blocks=1, num_visual_blocks=2, axes_dims=(8, 4, 4),
        visual_cond=False,
    )
    params = shard_dit_params(
        init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32), mesh)
    opt = make_optimizer(lr=1e-4)
    state = shard_train_state(init_train_state(params, opt), mesh)
    with sharding_ctx(mesh):
        state, loss = train_step(
            state, cfg, opt, batch["latents"], batch["text_embeds"],
            batch["pooled_embed"], batch["text_mask"],
            jax.random.PRNGKey(1), attn_impl="dense")
    assert np.isfinite(float(loss))


def test_host_shard_partitions_disjoint(tmp_path):
    paths = _make_shards(tmp_path, n_shards=4)
    l0 = LatentShardLoader(paths, batch_size=2, host_shard=(0, 2))
    l1 = LatentShardLoader(paths, batch_size=2, host_shard=(1, 2))
    assert set(l0.paths).isdisjoint(l1.paths)
    assert set(l0.paths) | set(l1.paths) == set(paths)
