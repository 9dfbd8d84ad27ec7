"""Tensor-parallel sharding for the DiT over a TPU mesh.

TPU-native replacement for the reference's torch DTensor plan
(/root/reference/kandinsky/models/parallelize.py:11-102, installed at
utils.py:121-122). The reference's strategy — head-sharded QKV
(Colwise), row-sharded attention-out / FF-out, sequence-parallel norms,
replicated text blocks — maps onto one ``jax.sharding.Mesh`` with axes:

  * ``dp``  — data parallel: the CFG cond/uncond pair (and any extra
    prompts) shard the batch; replaces the reference's two sequential
    CFG calls *and* its rank-0 broadcast choreography
    (t2v_pipeline.py:108-139) — single-controller JAX has no ranks.
  * ``tp``  — tensor parallel: attention heads and FF hidden dim.
    XLA inserts the all-reduces the DTensor plan made explicit.

Parameters get NamedShardings; activations are steered with
``with_sharding_constraint`` inside the model (sequence-sharded between
blocks — the reference's SequenceParallel-on-norms analog,
parallelize.py:39-56).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(n_devices: Optional[int] = None, dp: int = 1,
              devices=None, sp: int = 1) -> Mesh:
    """Mesh ("dp", "sp", "tp") over the available devices.

    dp*sp divides the device count; the rest is tp. The reference only
    supports 1-D TP over 1/2/4 GPUs (utils.py:49-52); here dp>1
    additionally parallelizes the CFG pair / multi-prompt batches, and
    sp>1 slices the attention SEQUENCE (ops/attention.py shard_map) so
    device counts that don't divide the 28 heads still use every chip
    (v5e-8: tp=4 x sp=2).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (dp * sp) == 0, f"dp*sp={dp * sp} must divide {n} devices"
    arr = np.array(devices).reshape(dp, sp, n // (dp * sp))
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def plan_dit_mesh(n_devices: int, num_heads: int = 28, dp: int = 1,
                  devices=None) -> Mesh:
    """Pick (dp, sp, tp) for the DiT: tp = the largest divisor of the
    per-dp device count that also divides ``num_heads`` (head-parallel
    attention needs whole heads per device); the remainder becomes sp
    (sequence-sliced attention + KV all-gather). 8 devices / 28 heads
    -> (dp=1, sp=2, tp=4)."""
    per = n_devices // dp
    tp = 1
    for t in range(per, 0, -1):
        if per % t == 0 and num_heads % t == 0:
            tp = t
            break
    return make_mesh(n_devices=n_devices, dp=dp, sp=per // tp,
                     devices=devices)


def make_hybrid_mesh(tp: int = 4, dp_ici: int = 1, devices=None,
                     host_index_fn=None) -> Mesh:
    """Multi-host mesh: dp spans hosts over DCN; (dp_ici, tp) ride ICI.

    The reference stops at 4 GPUs on one node (utils.py:49-52); this is
    the growth path past one slice: axis names stay ("dp", "tp") so all
    param specs and activation constraints apply unchanged, while the
    device order guarantees every tp row sits WITHIN one host — XLA's
    tp all-reduces stay on ICI and only the dp collectives (CFG pair /
    batch, plus gradient psums in training) cross DCN, which is the
    bandwidth-appropriate split (dp moves O(batch) activations; tp would
    move O(hidden) per layer).

    host_index_fn exists for tests: the production default groups by
    ``device.process_index``.
    """
    if devices is None:
        devices = jax.devices()
    if host_index_fn is None:
        host_index_fn = lambda d: d.process_index  # noqa: E731
    hosts = {}
    for d in devices:
        hosts.setdefault(host_index_fn(d), []).append(d)
    groups = [hosts[k] for k in sorted(hosts)]
    per = len(groups[0])
    assert all(len(g) == per for g in groups), "uneven devices per host"
    assert per == dp_ici * tp, (
        f"dp_ici*tp = {dp_ici * tp} != {per} devices per host")
    arr = np.array(
        [np.array(g, dtype=object).reshape(dp_ici, tp) for g in groups],
        dtype=object)
    arr = arr.reshape(len(groups) * dp_ici, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def dit_param_specs(mesh: Mesh) -> dict:
    """PartitionSpec pytree matching the DiT param tree layout.

    Per-block leaves carry a leading stacked-block axis (None).
    Mirrors parallelize.py: QKV Colwise (out-dim = packed heads),
    attention-out and FF-out Rowwise (in-dim), FF-in Colwise,
    modulation/embeddings/text blocks replicated.
    """
    rep = P()
    attn = {
        "to_query": {"weight": P(None, None, "tp"), "bias": P(None, "tp")},
        "to_key": {"weight": P(None, None, "tp"), "bias": P(None, "tp")},
        "to_value": {"weight": P(None, None, "tp"), "bias": P(None, "tp")},
        # row-parallel: output is a partial sum -> XLA all-reduces
        "out_layer": {"weight": P(None, "tp", None), "bias": P(None)},
        "query_norm": {"weight": P(None)},
        "key_norm": {"weight": P(None)},
    }
    ff = {
        "in_layer": {"weight": P(None, None, "tp")},
        "out_layer": {"weight": P(None, "tp", None)},
    }
    lin = lambda: {"weight": rep, "bias": rep}
    norm = lambda: {"weight": rep, "bias": rep}
    return {
        "time_embeddings": {"in_layer": lin(), "out_layer": lin()},
        "text_embeddings": {"in_layer": lin(), "norm": norm()},
        "pooled_text_embeddings": {"in_layer": lin(), "norm": norm()},
        "visual_embeddings": {"in_layer": lin()},
        # text blocks replicated, exactly as the reference leaves them
        # (parallelize.py only touches visual blocks + embeddings)
        "text_transformer_blocks": {
            "text_modulation": {"out_layer": {"weight": P(None), "bias": P(None)}},
            "self_attention": {
                k: {kk: P(None) for kk in v} for k, v in attn.items()
            },
            "feed_forward": {"in_layer": {"weight": P(None)},
                             "out_layer": {"weight": P(None)}},
        },
        "visual_transformer_blocks": {
            "visual_modulation": {"out_layer": {"weight": P(None), "bias": P(None)}},
            "self_attention": attn,
            "cross_attention": {k: dict(v) for k, v in attn.items()},
            "feed_forward": ff,
        },
        "out_layer": {
            "modulation": {"out_layer": lin()},
            "out_layer": lin(),
        },
    }


def _adapt_quantized_specs(params, specs):
    """Match a spec tree to a W8A8-quantized param tree
    (models/nn.py:quantize_linear): ``weight_i8`` keeps the weight's
    spec; ``w_scale`` (per-out-channel, weight.shape minus the ``in``
    axis) keeps the weight spec minus its -2 entry — col-parallel
    scales shard with their columns, row-parallel scales replicate."""
    if isinstance(params, dict):
        if "weight_i8" in params:
            wspec = tuple(specs["weight"])
            out = {"weight_i8": specs["weight"],
                   "w_scale": P(*(wspec[:-2] + wspec[-1:]))}
            if "bias" in params:
                out["bias"] = specs["bias"]
            return out
        return {k: _adapt_quantized_specs(params[k], specs[k])
                for k in params}
    return specs


def shard_dit_params(params: dict, mesh: Mesh) -> dict:
    """Place a DiT param pytree onto the mesh with TP shardings.
    Handles both bf16 and W8A8-quantized (quantize_dit_params) trees."""
    specs = _adapt_quantized_specs(params, dit_param_specs(mesh))

    def place(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)


# ---------------------------------------------------------------------------
# Activation constraint context
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Optional[Mesh] = None


class sharding_ctx:
    """Trace-time context enabling activation sharding constraints inside
    the model code. Used as ``with sharding_ctx(mesh): jit(...)``."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


def active_mesh() -> Optional[Mesh]:
    """The mesh installed by the enclosing sharding_ctx, or None."""
    return _ACTIVE_MESH


def constrain(x: Array, *spec) -> Array:
    """with_sharding_constraint(x, spec) when a mesh context is active;
    identity otherwise (single-chip path stays clean)."""
    if _ACTIVE_MESH is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE_MESH, P(*spec)))


def constrain_heads(x: Array) -> Array:
    """(B, L, H, D) attention activations: batch on dp, heads on tp."""
    return constrain(x, "dp", None, "tp", None)


def constrain_seq(x: Array) -> Array:
    """(B, S, D) residual stream between blocks: batch on dp, sequence on
    (sp, tp) — the sequence-parallel layout the reference applies to
    norms (parallelize.py:39-56), widened over both non-batch axes when
    the mesh carries an sp dimension."""
    if _ACTIVE_MESH is not None and _ACTIVE_MESH.shape.get("sp", 1) > 1:
        return constrain(x, "dp", ("sp", "tp"), None)
    return constrain(x, "dp", "tp", None)


def constrain_batch(x: Array) -> Array:
    return constrain(x, "dp")
