"""Benchmark: end-to-end 5s distill-16 latency (DiT denoise + VAE decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 35.0 (<1.0 beats the reference's H100 distill-5s
end-to-end number, BASELINE.md; that target assumes v5e-8 — this
harness runs on however many chips are visible, currently one).

Flags: --quick (2 denoise steps, skip VAE), --nabla (additionally
report one 10s NABLA layer call on stderr).

Timing notes: through the tunneled axon backend ``block_until_ready``
does not synchronize and host fetches are slow (~10 MB/s), so each
phase is timed by fetching a scalar reduction (one ~30 ms round trip).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _sync_scalar(x):
    return float(jnp.sum(x[(0,) * (x.ndim - 1)][..., :1].astype(jnp.float32)))


def main():
    import kandinsky5_tpu  # noqa: F401  enables the persistent compile cache
    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import fast_init_dit_params
    from kandinsky5_tpu.sampling import DenoiseSpec, denoise

    quick = "--quick" in sys.argv

    cfg = DiTParams()  # released 2B architecture
    params = fast_init_dit_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)

    # 5s distill config: 16 NFE, no CFG (guidance 1.0), 768x512
    # latent (31, 64, 96, 16) -> 47,616 visual tokens (BASELINE.md)
    # NOTE: single device executions beyond ~2 min can crash the
    # tunneled TPU worker, so the 16 NFE run is measured as 4 chunks of
    # 4 steps (same compute; chunk boundaries add 4 host round trips)
    chunk_steps = 2 if quick else 4
    n_chunks = 1 if quick else 4
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=chunk_steps, guidance_weight=1.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
        attention_type="flash", attn_impl="auto",
    )
    num_steps = chunk_steps * n_chunks

    rng = np.random.RandomState(0)
    L = 256
    noise = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.float32)
    te = jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.bfloat16)
    mask = jnp.ones((1, L), bool)
    skip = jnp.zeros((chunk_steps, 2), bool)

    def run_denoise():
        x = noise
        for _ in range(n_chunks):
            x = denoise(params, spec, x, te, pe, mask, te, pe, mask, skip)
            _sync_scalar(x)
        return x

    t0 = time.perf_counter()
    latents = run_denoise()
    compile_denoise = time.perf_counter() - t0
    t0 = time.perf_counter()
    latents = run_denoise()
    t_denoise = time.perf_counter() - t0

    t_vae = 0.0
    if not quick:
        import gc

        from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params

        # free the 4GB DiT params before the decoder's full-res
        # activations land (single chip HBM budget)
        params = None
        run_denoise = None
        gc.collect()

        vae = HunyuanVideoVAE(
            init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16),
            dtype=jnp.bfloat16)

        def run_decode():
            video = vae.decode(latents.astype(jnp.bfloat16))
            _sync_scalar(video)

        t0 = time.perf_counter()
        run_decode()
        compile_vae = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_decode()
        t_vae = time.perf_counter() - t0
        print(f"# vae decode: compile+first {compile_vae:.1f}s, "
              f"steady {t_vae:.1f}s", file=sys.stderr)

    total = t_denoise + t_vae
    baseline = 35.0  # H100 distill-16 5s end-to-end (BASELINE.md)
    print(json.dumps({
        "metric": "5s_distill16_denoise_plus_vae_seconds",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(total / baseline, 3),
    }))
    print(f"# denoise: compile+first {compile_denoise:.1f}s, steady "
          f"{t_denoise:.1f}s ({num_steps} steps); devices="
          f"{len(jax.devices())}", file=sys.stderr)

    if "--nabla" in sys.argv:
        import functools

        from kandinsky5_tpu.ops.nabla import nabla_attention, sta_mask

        B, H, D = 2, 28, 64
        s1 = 61 * 4 * 6
        S = s1 * 64
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
        sta = jnp.asarray(sta_mask(61, 4, 6, 11, 3, 3))
        f = jax.jit(functools.partial(nabla_attention, thr=0.9, impl="sparse"))
        _sync_scalar(f(q, k, v, sta))
        t0 = time.perf_counter()
        _sync_scalar(f(q, k, v, sta))
        print(f"# nabla 10s layer call: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
