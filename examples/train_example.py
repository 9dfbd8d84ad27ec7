"""End-to-end fine-tuning example: data shards -> sharded train loop.

Demonstrates the full training stack the reference repo lacks:
precomputed-latent shards (data.py), the (dp, tp) mesh with ZeRO-1
optimizer sharding (training.py, parallel/sharding.py), and resumable
orbax checkpoints. Runs on any device set — a v5e pod slice, or the
virtual CPU mesh below for a smoke run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_example.py --smoke

With real data, point --shards at directories of .npz shards produced
by data.write_shard / data.precompute_shard and drop --smoke.
"""

import argparse
import glob
import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", default=None,
                    help="glob of .npz latent shards")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + synthetic shards (CI/CPU)")
    args = ap.parse_args()

    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.data import LatentShardLoader, write_shard
    from kandinsky5_tpu.models.dit import init_dit_params
    from kandinsky5_tpu.parallel.sharding import (
        make_mesh,
        shard_dit_params,
        sharding_ctx,
    )
    from kandinsky5_tpu.training import (
        init_train_state,
        load_train_state,
        make_optimizer,
        save_train_state,
        shard_train_state,
        train_step,
    )

    if args.smoke:
        cfg = DiTParams(
            in_visual_dim=4, out_visual_dim=4, in_text_dim=32,
            in_text_dim2=8, time_dim=32, patch_size=(1, 2, 2),
            model_dim=128, ff_dim=256, num_text_blocks=1,
            num_visual_blocks=2, axes_dims=(8, 4, 4), visual_cond=False)
        tmp = tempfile.mkdtemp()
        rng = np.random.RandomState(0)
        for i in range(2):
            write_shard(os.path.join(tmp, f"s{i}.npz"),
                        rng.randn(8, 2, 8, 8, 4), rng.randn(8, 16, 32),
                        rng.randn(8, 8), np.ones((8, 16), bool))
        shard_paths = glob.glob(os.path.join(tmp, "*.npz"))
        dtype = jnp.float32
    else:
        cfg = DiTParams()  # the released 2B architecture
        shard_paths = glob.glob(args.shards)
        dtype = jnp.bfloat16

    mesh = make_mesh(dp=args.dp)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    params = shard_dit_params(
        init_dit_params(jax.random.PRNGKey(0), cfg, dtype=dtype), mesh)
    opt = make_optimizer(lr=args.lr)
    state = shard_train_state(init_train_state(params, opt), mesh)
    if args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        state = load_train_state(args.ckpt_dir, state)
        print(f"resumed at step {int(state.step)}")

    loader = LatentShardLoader(shard_paths, batch_size=args.batch_size,
                               seed=0, mesh=mesh, dtype=dtype)
    step = int(state.step)
    epoch = 0
    while step < args.steps:
        for batch in loader.epoch(epoch):
            with sharding_ctx(mesh):
                state, loss = train_step(
                    state, cfg, opt, batch["latents"],
                    batch["text_embeds"], batch["pooled_embed"],
                    batch["text_mask"], jax.random.PRNGKey(step),
                    attn_impl="dense" if args.smoke else "auto")
            step = int(state.step)
            print(f"step {step}: loss {float(loss):.4f}")
            if args.ckpt_dir and step % 100 == 0:
                save_train_state(state, args.ckpt_dir, step)
            if step >= args.steps:
                break
        epoch += 1
    if args.ckpt_dir:
        save_train_state(state, args.ckpt_dir, step)
    print("done")


if __name__ == "__main__":
    main()
