"""Persistent XLA compilation cache.

Compiles through the tunneled axon backend are expensive (a single 3D
conv measured 116 s); the on-disk cache amortizes them across processes
and bench runs. Imported for side effect by kandinsky5_tpu.__init__.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "KANDINSKY5_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", "..",
                                         ".jax_cache"))


def enable():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


enable()
