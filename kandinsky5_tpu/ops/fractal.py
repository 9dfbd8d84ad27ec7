"""Fractal (zigzag) token reordering as a precomputed gather.

The reference reorders visual tokens so that every consecutive run of 64
tokens corresponds to one (1, 8, 8) spatial tile of the latent grid —
this makes each 64-token attention block spatially local, which is what
the NABLA block mask assumes (/root/reference/kandinsky/models/utils.py:
31-105, invoked from dit.py:144-151).

The torch version does this with view/permute gymnastics per call. On
TPU it is a *static permutation* of the token axis (SURVEY.md Appendix B
verified it is an exact round-trip), so we precompute the index vector
on the host once per shape and apply it with a single gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PIXEL = 8  # tile side in latent tokens (reference models/utils.py:33)


@functools.lru_cache(maxsize=64)
def fractal_permutation(grid: Tuple[int, int, int]) -> np.ndarray:
    """perm[i] = flat index (row-major over T,H,W) of the token that goes
    to fractal position i. Matches reference local_patching with group
    (1, 8, 8) (models/utils.py:54-78)."""
    t, h, w = grid
    assert h % PIXEL == 0 and w % PIXEL == 0, (
        f"latent grid {grid} not divisible by {PIXEL}-tile"
    )
    idx = np.arange(t * h * w, dtype=np.int32).reshape(t, h, w)
    idx = idx.reshape(t, h // PIXEL, PIXEL, w // PIXEL, PIXEL)
    # (T, Hb, Wb, ph, pw): blocks outer, in-tile inner
    idx = idx.transpose(0, 1, 3, 2, 4)
    return idx.reshape(-1)


@functools.lru_cache(maxsize=64)
def fractal_inverse_permutation(grid: Tuple[int, int, int]) -> np.ndarray:
    return np.argsort(fractal_permutation(grid)).astype(np.int32)


def fractal_flatten(x: jax.Array, grid: Tuple[int, int, int],
                    block_mask: bool = True) -> jax.Array:
    """x: (B, S, ...) with S = T*H*W row-major -> fractal order (or identity
    when block_mask is False, reference fractal_flatten models/utils.py:31-41)."""
    if not block_mask:
        return x
    perm = jnp.asarray(fractal_permutation(grid))
    return jnp.take(x, perm, axis=1)


def fractal_unflatten(x: jax.Array, grid: Tuple[int, int, int],
                      block_mask: bool = True) -> jax.Array:
    if not block_mask:
        return x
    inv = jnp.asarray(fractal_inverse_permutation(grid))
    return jnp.take(x, inv, axis=1)
