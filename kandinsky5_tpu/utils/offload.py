"""Model offloading: host-RAM staging between pipeline stages.

TPU analog of the reference's ``--offload`` CPU<->GPU shuffling
(/root/reference/kandinsky/generation_utils.py:164-226,
t2v_pipeline.py:133-134): parameter pytrees live in host memory and are
placed into device HBM only for the stage that needs them (text encode
-> denoise -> VAE decode), freeing HBM in between. Useful when a single
chip must hold the 7B text encoder, the 2B DiT and the VAE.
"""

from __future__ import annotations

import gc

import jax
import numpy as np


class ParamStore:
    """Holds a pytree on host; stages it onto device on demand."""

    def __init__(self, params, offload: bool = False, dtype=None):
        self.offload = offload
        self.dtype = dtype
        if offload:
            # keep host copies as numpy (fp32 view of bf16 handled by jax)
            self._host = jax.tree.map(np.asarray, params)
            self._device = None
        else:
            self._host = None
            self._device = params

    @property
    def params(self):
        if self._device is None:
            self.stage()
        return self._device

    def stage(self):
        if self._device is None:
            assert self._host is not None
            put = (lambda a: jax.device_put(a)) if self.dtype is None else (
                lambda a: jax.device_put(a).astype(self.dtype))
            self._device = jax.tree.map(put, self._host)
        return self._device

    def unstage(self):
        """Drop the device copy (no-op unless offloading). References are
        released rather than force-deleted so in-flight async computation
        that still reads the buffers completes safely; HBM is reclaimed
        once the runtime's own references drain."""
        if self.offload and self._device is not None:
            self._device = None
            gc.collect()


class staged:
    """Context manager: ``with staged(store) as params: ...`` stages on
    entry and (when offloading) releases HBM on exit."""

    def __init__(self, store: ParamStore):
        self.store = store

    def __enter__(self):
        return self.store.stage()

    def __exit__(self, *exc):
        self.store.unstage()
        return False
