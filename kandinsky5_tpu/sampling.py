"""Flow-matching Euler sampling as one jitted scan.

TPU re-design of the reference denoise loop
(/root/reference/kandinsky/generation_utils.py:39-129):

  * the Python ``for (t, dt) in timesteps`` loop becomes ``jax.lax.scan``
    inside a single jit — one compilation, no per-step dispatch;
  * classifier-free guidance runs as a batch-2 DiT forward (cond, uncond)
    instead of two sequential calls (generation_utils.py:53-73) — both
    branches share one pass over the weights (HBM-bound win);
  * MagCache (reference magcache_utils.py) is a *host-precomputed* skip
    schedule — its counter arithmetic depends only on the calibrated
    mag_ratios, so the data-dependent monkey-patching dissolves into a
    static per-step plan plus a carried residual.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kandinsky5_tpu.config import DiTParams, MagCacheConfig
from kandinsky5_tpu.models.dit import (
    SparseParams,
    dit_epilogue,
    dit_prologue,
    dit_visual_blocks,
)
from kandinsky5_tpu.ops.nabla import sta_mask

Array = jax.Array


def timestep_grid(num_steps: int, scheduler_scale: float) -> np.ndarray:
    """linspace(1→0) warped by s·t/(1+(s−1)·t)
    (reference generation_utils.py:102-103)."""
    t = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float32)
    t = scheduler_scale * t / (1 + (scheduler_scale - 1) * t)
    return t.astype(np.float32)


def magcache_schedule(
    mag_cfg: MagCacheConfig, num_steps: int, no_cfg: bool
) -> np.ndarray:
    """Precompute the per-call skip decisions of the reference MagCache
    (magcache_utils.py:40-101). The decision chain (counter, accumulated
    ratio/error/steps) is independent of activations, so it is evaluated
    on the host once. Returns bool (num_steps, 2): [cond, uncond] skip
    flags per sampling step (uncond column unused when no_cfg).
    """
    ratios = np.array([1.0, 1.0] + list(mag_cfg.mag_ratios), dtype=np.float64)
    total = num_steps * 2
    if len(ratios) != total:
        # nearest-neighbour re-interpolation (magcache_utils.py:6-13,30-37)
        def nearest(src, n):
            if n == 1:
                return np.array([src[-1]])
            scale = (len(src) - 1) / (n - 1)
            return src[np.round(np.arange(n) * scale).astype(int)]

        con = nearest(ratios[0::2], num_steps)
        ucon = nearest(ratios[1::2], num_steps)
        ratios = np.stack([con, ucon], axis=1).reshape(-1)

    skip = np.zeros((num_steps, 2), dtype=bool)
    acc_ratio = [1.0, 1.0]
    acc_steps = [0, 0]
    acc_err = [0.0, 0.0]
    warmup = int(total * mag_cfg.retention_ratio)
    calls = range(0, total, 2) if no_cfg else range(total)
    for cnt in calls:
        b = cnt % 2
        step = cnt // 2
        if cnt >= warmup:
            acc_ratio[b] *= ratios[cnt]
            acc_steps[b] += 1
            acc_err[b] += abs(1 - acc_ratio[b])
            if acc_err[b] < mag_cfg.threshold and acc_steps[b] <= mag_cfg.K:
                skip[step, b] = True
            else:
                acc_ratio[b], acc_steps[b], acc_err[b] = 1.0, 0, 0.0
    return skip


@dataclass(frozen=True)
class DenoiseSpec:
    """Static (trace-time) description of one denoise run."""

    dit_params: DiTParams
    num_steps: int
    guidance_weight: float
    scheduler_scale: float
    scale_factor: Tuple[float, float, float]
    attention_type: str = "flash"  # "flash" | "nabla"
    nabla_P: float = 0.9
    nabla_wT: int = 11
    nabla_wH: int = 3
    nabla_wW: int = 3
    # worst-case bound for the sparse path (ops/nabla.nabla_block_mask);
    # inert at the released checkpoints' ~5-15% real densities
    nabla_max_density: Optional[float] = 0.75
    # bank size / threshold algorithm; (1, "sort", max_density=None) is
    # the exact-reference parity mode through the production kernel
    nabla_q_rows: int = 8
    nabla_method: str = "bisect"
    # framework extension (default OFF): build the adaptive mask once
    # per step from block 0 and reuse across all layers
    nabla_shared_mask: bool = False
    attn_impl: str = "auto"
    # run the CFG pair as two sequential forwards instead of one batch-2
    # call (the reference's scheme, generation_utils.py:53-73) — halves
    # activation memory; used for 10s sequences on a single chip
    sequential_cfg: bool = False

    @property
    def use_cfg(self) -> bool:
        # reference skips the uncond branch when |w-1| <= 1e-6
        # (generation_utils.py:63)
        return abs(self.guidance_weight - 1.0) > 1e-6


def _build_sparse(spec: DenoiseSpec, grid) -> Optional[SparseParams]:
    if spec.attention_type != "nabla":
        return None
    t, h, w = grid
    assert h % 8 == 0 and w % 8 == 0, f"NABLA needs 8-divisible latent grid, got {grid}"
    sta = np.asarray(
        sta_mask(t, h // 8, w // 8, spec.nabla_wT, spec.nabla_wH, spec.nabla_wW)
    )
    return SparseParams(sta=jnp.asarray(sta), P=spec.nabla_P,
                        max_density=spec.nabla_max_density,
                        q_rows=spec.nabla_q_rows, method=spec.nabla_method,
                        shared_mask=spec.nabla_shared_mask)


def denoise_residual0(spec: DenoiseSpec, noise_shape) -> Tuple[int, int]:
    """(b_eff, seq_len) of the MagCache residual carried by the scan."""
    cfg = spec.dit_params
    batch = noise_shape[0]
    b_eff = 2 * batch if spec.use_cfg else batch
    seq_len = (noise_shape[1] // cfg.patch_size[0]
               * noise_shape[2] // cfg.patch_size[1]
               * noise_shape[3] // cfg.patch_size[2])
    return b_eff, seq_len


def _visual_cond_input(cfg: DiTParams, x: Array, pdtype) -> Array:
    """[x, zeros, zero-mask] channel concat -> 33 channels when
    visual_cond (reference generation_utils.py:107-114)."""
    if cfg.visual_cond:
        zeros = jnp.zeros_like(x)
        zmask = jnp.zeros((*x.shape[:-1], 1), x.dtype)
        model_in = jnp.concatenate([x, zeros, zmask], axis=-1)
    else:
        model_in = x
    return model_in.astype(pdtype)


def _dit_call(params, spec: DenoiseSpec, sparse, grid, model_in, text_i,
              pooled_i, mask_i, t, skip_b, residual_i):
    """One DiT evaluation with MagCache skip/residual handling — the
    single body shared by the scanned span and the host-driven
    one-call path. skip_b: (nb,) bool per-branch skip flags."""
    cfg = spec.dit_params
    pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
    to_fractal = sparse is not None
    nb = model_in.shape[0]
    time_vec = jnp.full((nb,), t * 1000.0, jnp.float32)
    visual, text_o, time_embed, rope, _ = dit_prologue(
        params, cfg, model_in, text_i, pooled_i, time_vec, mask_i,
        spec.scale_factor, spec.attn_impl, to_fractal)

    def run_blocks(visual_in, res_in):
        out = dit_visual_blocks(params, cfg, visual_in, text_o, time_embed,
                                rope, mask_i, spec.attn_impl, sparse)
        new_res = (out.astype(jnp.float32)
                   - visual_in.astype(jnp.float32)).astype(pdtype)
        # per-branch skip: branches flagged skip reuse the cached
        # residual even when the other branch runs
        # (reference magcache_utils.py:79-87)
        sk = skip_b[:, None, None]
        out = jnp.where(sk, visual_in + res_in, out)
        new_res = jnp.where(sk, res_in, new_res)
        return out, new_res

    def skip_blocks(visual_in, res_in):
        return visual_in + res_in, res_in

    visual, residual_i = jax.lax.cond(
        ~jnp.all(skip_b), run_blocks, skip_blocks, visual, residual_i)
    pred = dit_epilogue(params, cfg, visual, time_embed, grid, to_fractal)
    return pred.astype(jnp.float32), residual_i


def _progress_print(i, n):
    print(f"\rdenoise step {int(i)}/{int(n)}", end="", flush=True)
    if int(i) == int(n):
        print(flush=True)


@functools.partial(
    jax.jit,
    static_argnames=("spec",),
)
def denoise_span(
    params,
    spec: DenoiseSpec,
    noise: Array,
    residual0: Array,
    times: Array,
    dts: Array,
    text_embeds: Array,
    pooled_embed: Array,
    text_mask: Array,
    null_text_embeds: Array,
    null_pooled_embed: Array,
    null_text_mask: Array,
    skip_schedule: Array,
) -> Tuple[Array, Array]:
    """Integrate an arbitrary SPAN of the Euler schedule.

    Same computation as :func:`denoise`, but the timesteps (times, dts —
    (k,) slices of the full grid), the incoming MagCache residual and
    the matching (k, 2) skip slice arrive as arguments and the carried
    residual is returned — the building block for the chunked /
    preemption-resumable path (utils/resume.py) and the per-step
    progress loop (:func:`generate_latents` ``progress=True``).
    """
    cfg = spec.dit_params
    use_cfg = spec.use_cfg
    batch = noise.shape[0]

    if use_cfg:
        # [cond_0..cond_B-1, uncond_0..uncond_B-1]
        text = jnp.concatenate([text_embeds, null_text_embeds], axis=0)
        pooled = jnp.concatenate([pooled_embed, null_pooled_embed], axis=0)
        mask = jnp.concatenate([text_mask, null_text_mask], axis=0)
    else:
        text, pooled, mask = text_embeds, pooled_embed, text_mask

    pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
    _, t_lat, h_lat, w_lat, c_lat = noise.shape
    grid = (t_lat // cfg.patch_size[0], h_lat // cfg.patch_size[1],
            w_lat // cfg.patch_size[2])
    sparse = _build_sparse(spec, grid)

    def dit_call(model_in, text_i, pooled_i, mask_i, t, skip_b, residual_i):
        return _dit_call(params, spec, sparse, grid, model_in, text_i,
                         pooled_i, mask_i, t, skip_b, residual_i)

    def step(carry, xs):
        x, residual = carry
        t, dt, skip = xs
        model_in = _visual_cond_input(cfg, x, pdtype)

        skip_c = jnp.broadcast_to(skip[0], (batch,))
        skip_u = jnp.broadcast_to(skip[1], (batch,))

        if use_cfg and spec.sequential_cfg:
            v_cond, res_c = dit_call(model_in, text_embeds, pooled_embed,
                                     text_mask, t, skip_c, residual[:batch])
            v_uncond, res_u = dit_call(model_in, null_text_embeds,
                                       null_pooled_embed, null_text_mask, t,
                                       skip_u, residual[batch:])
            residual = jnp.concatenate([res_c, res_u], axis=0)
            velocity = v_uncond + spec.guidance_weight * (v_cond - v_uncond)
        elif use_cfg:
            model_in2 = jnp.concatenate([model_in, model_in], axis=0)
            skip_b = jnp.concatenate([skip_c, skip_u])
            pred, residual = dit_call(model_in2, text, pooled, mask, t,
                                      skip_b, residual)
            v_cond, v_uncond = pred[:batch], pred[batch:]
            velocity = v_uncond + spec.guidance_weight * (v_cond - v_uncond)
        else:
            velocity, residual = dit_call(model_in, text, pooled, mask, t,
                                          skip_c, residual)
        x = x + dt * velocity
        return (x, residual), None

    (x, residual), _ = jax.lax.scan(
        step, (noise, residual0), (times, dts, skip_schedule))
    return x, residual


@functools.partial(
    jax.jit,
    static_argnames=("spec",),
)
def denoise(
    params,
    spec: DenoiseSpec,
    noise: Array,
    text_embeds: Array,
    pooled_embed: Array,
    text_mask: Array,
    null_text_embeds: Array,
    null_pooled_embed: Array,
    null_text_mask: Array,
    skip_schedule: Array,
) -> Array:
    """Run the full Euler flow-matching integration.

    noise: (B, T, H, W, C) float32 seed latents (B prompts batched; the
    reference is single-prompt, generation_utils.py:132).
    text/null embeds: (B, L, in_text_dim); pooled: (B, in_text_dim2);
    masks: (B, L) bool.
    skip_schedule: (num_steps, 2) bool MagCache plan (all-False = off).
    Returns the final latent, same shape/dtype as ``noise``.
    """
    cfg = spec.dit_params
    pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
    ts = jnp.asarray(timestep_grid(spec.num_steps, spec.scheduler_scale))
    b_eff, seq_len = denoise_residual0(spec, noise.shape)
    residual0 = jnp.zeros((b_eff, seq_len, cfg.model_dim), pdtype)
    x, _ = denoise_span(
        params, spec, noise, residual0, ts[:-1], jnp.diff(ts),
        text_embeds, pooled_embed, text_mask,
        null_text_embeds, null_pooled_embed, null_text_mask, skip_schedule)
    return x


@functools.partial(jax.jit, static_argnames=("spec",))
def denoise_one_call(params, spec: DenoiseSpec, x: Array, text: Array,
                     pooled: Array, mask: Array, t: Array, skip_flag: Array,
                     residual: Array):
    """One DiT evaluation (single CFG branch) with MagCache residual
    handling — the building block of the host-driven step loop.

    Exists because some runtimes bound single-execution wall time (the
    tunneled bench chip kills executions over ~1 min); the fused
    ``denoise`` scan is the production path.
    """
    cfg = spec.dit_params
    pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
    _, t_lat, h_lat, w_lat, _ = x.shape
    grid = (t_lat // cfg.patch_size[0], h_lat // cfg.patch_size[1],
            w_lat // cfg.patch_size[2])
    sparse = _build_sparse(spec, grid)
    model_in = _visual_cond_input(cfg, x, pdtype)
    skip_b = jnp.broadcast_to(skip_flag, (model_in.shape[0],))
    return _dit_call(params, spec, sparse, grid, model_in, text, pooled,
                     mask, t, skip_b, residual)


def denoise_host_loop(
    params,
    spec: DenoiseSpec,
    noise: Array,
    cond: dict,
    uncond: dict,
    skip_schedule,
    progress: bool = False,
) -> Array:
    """Host-driven Euler loop: one device execution per DiT call (per
    CFG branch per step). Numerically identical to ``denoise`` with
    sequential_cfg; use when the runtime bounds execution wall time.

    vs the default BATCHED-CFG scan the sequential pair differs at the
    TPU's matmul rounding level (different batch tiling): measured
    ~0.45% max latent delta after 6 steps at guidance 5 in fp32-params
    (v5e defaults fp32 matmuls to bf16 passes) — same magnitude before
    and after the r4 dit_call dedup, i.e. intrinsic, not a code path
    difference."""
    cfg = spec.dit_params
    pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
    ts = timestep_grid(spec.num_steps, spec.scheduler_scale)
    grid_prod = (noise.shape[1] // cfg.patch_size[0]
                 * noise.shape[2] // cfg.patch_size[1]
                 * noise.shape[3] // cfg.patch_size[2])
    b = noise.shape[0]
    res_c = jnp.zeros((b, grid_prod, cfg.model_dim), pdtype)
    res_u = jnp.zeros((b, grid_prod, cfg.model_dim), pdtype)
    x = noise
    for i in range(spec.num_steps):
        t = jnp.float32(ts[i])
        dt = jnp.float32(ts[i + 1] - ts[i])
        v_c, res_c = denoise_one_call(
            params, spec, x, cond["text_embeds"], cond["pooled_embed"],
            cond["mask"], t, jnp.bool_(skip_schedule[i, 0]), res_c)
        if spec.use_cfg:
            v_u, res_u = denoise_one_call(
                params, spec, x, uncond["text_embeds"],
                uncond["pooled_embed"], uncond["mask"], t,
                jnp.bool_(skip_schedule[i, 1]), res_u)
            v = v_u + spec.guidance_weight * (v_c - v_u)
        else:
            v = v_c
        x = x + dt * v
        # force completion so each call is its own bounded execution
        x.block_until_ready()
        if progress:
            # per-step reporting (reference tqdm, generation_utils.py:105)
            _progress_print(i + 1, spec.num_steps)
    return x


def generate_latents(
    params,
    spec: DenoiseSpec,
    shape: Tuple[int, int, int, int, int],
    cond: dict,
    uncond: dict,
    seed: int,
    magcache: Optional[MagCacheConfig] = None,
    noise: Optional[Array] = None,
    host_loop: bool = False,
    progress: bool = False,
) -> Array:
    """Host-side wrapper: seed noise + schedule + jitted denoise.

    cond/uncond: {"text_embeds": (B,L,D), "pooled_embed": (B,P),
    "mask": (B,L) bool} — B prompts denoise as one batch (a framework
    extension; the reference is single-prompt). ``noise`` overrides the
    seeded Gaussian (parity tests inject the torch reference's noise
    here — JAX cannot reproduce torch RNG streams).
    """
    if noise is None:
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, shape, jnp.float32)
    if magcache is not None and len(magcache.mag_ratios) > 0:
        skip = magcache_schedule(magcache, spec.num_steps, no_cfg=not spec.use_cfg)
    else:
        skip = np.zeros((spec.num_steps, 2), dtype=bool)
    if host_loop:
        return denoise_host_loop(params, spec, noise, cond, uncond, skip,
                                 progress=progress)
    if progress:
        # per-step reporting (reference tqdm, generation_utils.py:105):
        # drive the schedule as length-1 ``denoise_span`` chunks from the
        # host — bitwise-identical to the fused scan (the resume tests
        # assert exact chunked==fused equality) and backend-safe: device
        # host-callbacks (jax.debug.callback) hang on the tunneled axon
        # TPU service, so progress must come from the host side.
        cfg = spec.dit_params
        pdtype = params["visual_embeddings"]["in_layer"]["weight"].dtype
        ts = timestep_grid(spec.num_steps, spec.scheduler_scale)
        b_eff, seq_len = denoise_residual0(spec, noise.shape)
        residual = jnp.zeros((b_eff, seq_len, cfg.model_dim), pdtype)
        x = noise
        dts = np.diff(ts)
        for i in range(spec.num_steps):
            x, residual = denoise_span(
                params, spec, x, residual,
                jnp.asarray(ts[i:i + 1]), jnp.asarray(dts[i:i + 1]),
                cond["text_embeds"], cond["pooled_embed"], cond["mask"],
                uncond["text_embeds"], uncond["pooled_embed"],
                uncond["mask"], jnp.asarray(skip[i:i + 1]))
            x.block_until_ready()
            _progress_print(i + 1, spec.num_steps)
        return x
    return denoise(
        params, spec, noise,
        cond["text_embeds"], cond["pooled_embed"], cond["mask"],
        uncond["text_embeds"], uncond["pooled_embed"], uncond["mask"],
        jnp.asarray(skip),
    )
