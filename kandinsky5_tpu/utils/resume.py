"""Preemption-safe generation: chunked denoise with on-disk checkpoints.

TPU fleets run on preemptible capacity; a 100-NFE 10s generation is
minutes of work that a preemption would otherwise restart from scratch.
The reference has no recovery story (SURVEY.md §5). Here the Euler
integration runs in fixed-size chunks of :func:`sampling.denoise_span`;
after each chunk the full sampler state — latents, MagCache residual,
step index — is written atomically (tmp + rename) to one ``.npz``. A
relaunched job with the same checkpoint path resumes at the last saved
step; a fingerprint of (spec, shape, seed, conditioning) guards against
resuming someone else's state.

The chunk boundaries do not change numerics: ``denoise_span`` threads
the exact scan carry (latents + residual) across chunks, so the chunked
trajectory is bit-identical to the single-scan :func:`sampling.denoise`
(asserted in tests/test_resume.py).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from kandinsky5_tpu.config import MagCacheConfig
from kandinsky5_tpu.sampling import (
    DenoiseSpec,
    denoise_residual0,
    denoise_span,
    magcache_schedule,
    timestep_grid,
)

import jax

Array = jax.Array


def _fingerprint(spec: DenoiseSpec, shape, seed: int, cond: dict,
                 uncond: Optional[dict] = None) -> str:
    h = hashlib.sha256()
    h.update(repr(spec).encode())
    h.update(repr(tuple(shape)).encode())
    h.update(str(seed).encode())
    for d in (cond, uncond or {}):
        for k in sorted(d):
            a = np.ascontiguousarray(np.asarray(d[k], np.float32)).ravel()
            # strided sample across the WHOLE array (not just its head:
            # two prompts sharing a template prefix must not collide),
            # plus shape — bounded work for arbitrarily large embeddings
            stride = max(1, a.size // 4096)
            h.update(repr(np.asarray(d[k]).shape).encode())
            h.update(a[::stride][:8192].tobytes())
    return h.hexdigest()[:32]


def save_state(path: str, step: int, x: Array, residual: Array,
               fingerprint: str) -> None:
    """Atomic write of the sampler state (tmp + rename)."""
    tmp = path + ".tmp"
    np.savez(
        tmp,
        step=np.int64(step),
        x=np.asarray(x, np.float32),
        residual=np.asarray(residual, np.float32),
        fingerprint=np.frombuffer(fingerprint.encode(), np.uint8),
    )
    # np.savez appends .npz to names without it
    if not tmp.endswith(".npz"):
        tmp += ".npz"
    os.replace(tmp, path)


def load_state(path: str, fingerprint: str):
    """(step, x, residual) or None if absent/mismatched/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            fp = z["fingerprint"].tobytes().decode()
            if fp != fingerprint:
                return None
            return int(z["step"]), z["x"], z["residual"]
    except Exception:  # noqa: BLE001  (torn write from a hard kill)
        return None


def resumable_generate(
    params,
    spec: DenoiseSpec,
    shape,
    cond: dict,
    uncond: dict,
    seed: int,
    checkpoint_path: str,
    magcache: Optional[MagCacheConfig] = None,
    chunk: int = 4,
    progress: bool = False,
    _stop_after_chunks: Optional[int] = None,
) -> Optional[Array]:
    """Chunked, checkpointed drop-in for :func:`sampling.generate_latents`.

    Returns the final latents — or ``None`` when ``_stop_after_chunks``
    (test/preemption-simulation hook) stopped the run early; the state
    file then holds everything needed to resume.
    """
    cfg = spec.dit_params
    fp = _fingerprint(spec, shape, seed, cond, uncond)

    ts = timestep_grid(spec.num_steps, spec.scheduler_scale)
    if magcache is not None and len(magcache.mag_ratios) > 0:
        skip = magcache_schedule(magcache, spec.num_steps,
                                 no_cfg=not spec.use_cfg)
    else:
        skip = np.zeros((spec.num_steps, 2), dtype=bool)

    state = load_state(checkpoint_path, fp)
    if state is None:
        step = 0
        x = jax.random.normal(jax.random.PRNGKey(seed), tuple(shape),
                              jnp.float32)
        pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
        b_eff, seq_len = denoise_residual0(spec, shape)
        residual = jnp.zeros((b_eff, seq_len, cfg.model_dim), pdtype)
    else:
        step, x_np, res_np = state
        pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
        x = jnp.asarray(x_np, jnp.float32)
        residual = jnp.asarray(res_np, jnp.float32).astype(pdtype)
        if progress:
            print(f"resuming denoise at step {step}/{spec.num_steps}")

    chunks_done = 0
    while step < spec.num_steps:
        k = min(chunk, spec.num_steps - step)
        x, residual = denoise_span(
            params, spec, x, residual,
            jnp.asarray(ts[step:step + k]),
            jnp.asarray(np.diff(ts)[step:step + k]),
            cond["text_embeds"], cond["pooled_embed"], cond["mask"],
            uncond["text_embeds"], uncond["pooled_embed"], uncond["mask"],
            jnp.asarray(skip[step:step + k]))
        x.block_until_ready()
        step += k
        save_state(checkpoint_path, step, x, residual, fp)
        if progress:
            print(f"\rdenoise step {step}/{spec.num_steps}", end="",
                  flush=True)
        chunks_done += 1
        if _stop_after_chunks is not None and chunks_done >= _stop_after_chunks:
            if progress:
                print()
            return None
    if progress:
        print()
    try:
        os.remove(checkpoint_path)
    except OSError:
        pass
    return x
