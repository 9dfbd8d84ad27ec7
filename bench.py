"""Benchmark: end-to-end denoise latency of the flagship configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / baseline_seconds (<1.0 beats the reference's H100
number from BASELINE.md; target for 5s distill-16 is 35 s end-to-end on
v5e-8 — this harness currently measures the DiT denoise loop on however
many chips are visible).

Timing notes: on the tunneled axon backend ``block_until_ready`` does
not synchronize and host fetches are slow (~10 MB/s), so we time a
scalar fetch of a reduction of the output — one round trip (~30 ms)
included, negligible at these scales.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import fast_init_dit_params
    from kandinsky5_tpu.sampling import DenoiseSpec, denoise

    quick = "--quick" in sys.argv

    cfg = DiTParams()  # released 2B architecture
    params = fast_init_dit_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)

    # 5s distill config: 16 NFE, no CFG (guidance 1.0), 768x512
    # latent (31, 64, 96, 16) -> 47,616 visual tokens (BASELINE.md)
    num_steps = 2 if quick else 16
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=num_steps, guidance_weight=1.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
        attention_type="flash", attn_impl="auto",
    )

    rng = np.random.RandomState(0)
    L = 256
    noise = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.float32)
    te = jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.bfloat16)
    mask = jnp.ones((1, L), bool)
    skip = jnp.zeros((num_steps, 2), bool)

    def run():
        out = denoise(params, spec, noise, te, pe, mask, te, pe, mask, skip)
        # scalar fetch forces real synchronization through the tunnel
        return float(jnp.sum(out[0, 0, 0, 0]))

    t0 = time.perf_counter()
    run()
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0

    baseline = 35.0  # H100 distill-16 5s end-to-end (BASELINE.md)
    print(json.dumps({
        "metric": "5s_distill16_dit_denoise_seconds",
        "value": round(dt, 2),
        "unit": "s",
        "vs_baseline": round(dt / baseline, 3),
    }))
    print(f"# compile+first: {compile_and_first:.1f}s, steps={num_steps}, "
          f"devices={len(jax.devices())}", file=sys.stderr)


if __name__ == "__main__":
    main()
