"""Pallas TPU block-sparse attention consuming NABLA kv-block lists.

TPU-native replacement for torch flex_attention + BlockMask
(/root/reference/kandinsky/models/nn.py:257-280). The kernel walks, per
64-token query block, only the KV blocks listed active by the NABLA mask
(ops/nabla.py), in splash-attention style.

Stub gate for now: sparse_supported returns False until the kernel lands;
callers fall back to the XLA masked path (ops/nabla.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sparse_supported(q: Array) -> bool:
    return False


def sparse_attention(q: Array, k: Array, v: Array, kv_inds: Array,
                     kv_nb: Array) -> Array:
    raise NotImplementedError("Pallas block-sparse kernel lands next")
