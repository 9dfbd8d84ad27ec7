"""Flow-matching training for the DiT (framework extension).

The reference repo is inference-only (SURVEY.md §4-5: no training code,
no checkpoint saving). This module adds the natural training loop for
the same architecture so the framework supports fine-tuning /
distillation on TPU pods:

  * rectified-flow objective: x_t = (1-t)·x0 + t·eps,
    target velocity v* = eps - x0, loss = E ||DiT(x_t, t, cond) - v*||²
    (the Euler sampler in sampling.py integrates exactly this field);
  * optax adamw with gradient clipping; fp32 master params are the
    caller's choice of dtype;
  * the step jits over the same (dp, tp) NamedSharding layout as
    inference (parallel/sharding.py) — gradients all-reduce over dp via
    XLA; ``jax.checkpoint`` remats each scanned DiT block so the 32-deep
    backward fits HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from kandinsky5_tpu.config import DiTParams
from kandinsky5_tpu.models.dit import dit_forward

Array = jax.Array


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: Array


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01,
                   clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def init_train_state(params: dict, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def flow_matching_loss(
    params,
    cfg: DiTParams,
    x0: Array,
    text_embeds: Array,
    pooled_embed: Array,
    text_mask: Array,
    t: Array,
    noise: Array,
    scale_factor=(1.0, 2.0, 2.0),
    attn_impl: str = "auto",
) -> Array:
    """x0: clean latents (B, T, H, W, C); t: (B,) in (0, 1];
    noise: like x0. Returns scalar MSE against the true velocity."""
    tb = t[:, None, None, None, None].astype(jnp.float32)
    x_t = (1.0 - tb) * x0.astype(jnp.float32) + tb * noise.astype(jnp.float32)
    target = noise.astype(jnp.float32) - x0.astype(jnp.float32)

    if cfg.visual_cond:
        zeros = jnp.zeros_like(x_t)
        zmask = jnp.zeros((*x_t.shape[:-1], 1), x_t.dtype)
        model_in = jnp.concatenate([x_t, zeros, zmask], axis=-1)
    else:
        model_in = x_t
    pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
    pred = dit_forward(
        params, cfg, model_in.astype(pdtype), text_embeds, pooled_embed,
        t * 1000.0, text_mask=text_mask, scale_factor=scale_factor,
        attn_impl=attn_impl)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer", "attn_impl"))
def train_step(
    state: TrainState,
    cfg: DiTParams,
    optimizer,
    x0: Array,
    text_embeds: Array,
    pooled_embed: Array,
    text_mask: Array,
    rng: Array,
    attn_impl: str = "auto",
) -> Tuple[TrainState, Array]:
    """One optimization step; batch shards over dp, params over tp when
    called under parallel.sharding.sharding_ctx with sharded inputs."""
    t_key, n_key = jax.random.split(rng)
    b = x0.shape[0]
    t = jax.random.uniform(t_key, (b,), jnp.float32, 1e-4, 1.0)
    noise = jax.random.normal(n_key, x0.shape, jnp.float32)

    def loss_fn(params):
        return flow_matching_loss(params, cfg, x0, text_embeds, pooled_embed,
                                  text_mask, t, noise, attn_impl=attn_impl)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), loss


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """ZeRO-1-style placement of the optimizer state over the mesh.

    Adam's m/v moments are param-shaped fp32 — 2x the model again. They
    shard (a) exactly like their parameter (the TP plan), and (b) over
    the ``dp`` axis along the leading stacked-block dimension where it
    divides — so a 2B-param run stores moments at 1/(dp) per device
    instead of replicating 16 GB everywhere. XLA reshards around the
    optax update automatically (GSPMD), trading a dp all-gather per
    step for the memory.

    Params themselves keep their inference TP sharding
    (parallel.sharding.shard_dit_params).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kandinsky5_tpu.parallel.sharding import dit_param_specs

    dp = mesh.shape.get("dp", 1)
    specs = dit_param_specs(mesh)
    pstruct = jax.tree.structure(state.params)
    spec_leaf = lambda x: isinstance(x, jax.sharding.PartitionSpec)  # noqa: E731

    def moment_spec(spec, shape):
        parts = list(spec) + [None] * (len(shape) - len(spec))
        for ax, p in enumerate(parts):
            if p is None and shape[ax] % dp == 0 and shape[ax] >= dp > 1:
                parts[ax] = "dp"
                break
        return P(*parts)

    def place(leaf, spec):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, moment_spec(spec, leaf.shape)))

    def walk(node):
        # moments are param-structured subtrees of the optax state: key
        # their specs by TREE POSITION, not by leaf shape — the four
        # attention projections share (L, D, D) with different TP specs,
        # and shape-keying replicated them (GSPMD then resharded every
        # step)
        if jax.tree.structure(node) == pstruct:
            leaves, nstruct = jax.tree.flatten(node)
            spec_leaves = jax.tree.leaves(specs, is_leaf=spec_leaf)
            return jax.tree.unflatten(
                nstruct, [place(l, s) for l, s in zip(leaves, spec_leaves)])
        if isinstance(node, tuple):  # optax states are (Named)tuples
            children = [walk(c) for c in node]
            return (type(node)(*children) if hasattr(node, "_fields")
                    else tuple(children))
        return node

    return TrainState(params=state.params,
                      opt_state=walk(state.opt_state),
                      step=state.step)


def save_checkpoint(params: dict, path: str) -> None:
    """Export to the reference torch-layout safetensors (round-trips
    through checkpoint.dit_params_to_state_dict)."""
    import numpy as np
    from safetensors.numpy import save_file

    from kandinsky5_tpu.checkpoint import dit_params_to_state_dict

    sd = dit_params_to_state_dict(params)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def save_train_state(state: TrainState, ckpt_dir: str, step: int) -> None:
    """Orbax checkpoint of the FULL training state (params + adam
    moments + step), preserving shardings — restartable mid-run on the
    same mesh topology. Complements :func:`save_checkpoint`, which
    exports inference weights in the reference's safetensors layout."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        mgr.wait_until_finished()


def load_train_state(ckpt_dir: str, state_like: TrainState,
                     step=None) -> TrainState:
    """Restore a :func:`save_train_state` checkpoint onto the shardings
    of ``state_like`` (an initialized-and-sharded TrainState of the same
    architecture); ``step=None`` loads the latest."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        target = jax.tree.map(
            lambda x: (ocp.utils.to_shape_dtype_struct(x)
                       if hasattr(x, "shape") else x),
            state_like._asdict())
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(target))
    return TrainState(**restored)
