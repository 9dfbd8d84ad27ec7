"""VAE decode: faithful tiled vs streaming state-carry at the 5s
production latent shape (31, 64, 96, 16) -> 768x512x121 video.

Measures wall clock for both paths and the PSNR between them (the
quality gate VERDICT round-2 item 2 asks for; random weights are the
worst case for the per-chunk GroupNorm drift).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tools/bench_vae_stream.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :1, :1].astype(jnp.float32)))


def main():
    from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params
    from kandinsky5_tpu.utils.metrics import psnr

    vae = HunyuanVideoVAE(
        init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.bfloat16)

    def run(mode, **kw):
        if mode == "tiled":
            out = vae.decode(z)
        else:
            from kandinsky5_tpu.models.vae_stream import streaming_decode

            vae._apply_tiling(*vae._optimal_tiling(121, 512, 768))
            out = streaming_decode(vae.params, z, **kw)
        sync(out)
        return out

    results = {}
    for mode, kw in (("tiled", {}), ("stream2", {"chunk_lat": 2}),
                     ("stream3", {"chunk_lat": 3})):
        m = "tiled" if mode == "tiled" else "stream"
        try:
            t0 = time.perf_counter()
            out = run(m, **kw)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = run(m, **kw)
            t = time.perf_counter() - t0
            print(f"{mode}: compile+first {compile_s:.1f}s steady {t:.2f}s",
                  flush=True)
            results[mode] = (t, out)
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    if "tiled" in results:
        # PSNR on a slice (fetching the full 121x768x512 video through
        # the 10 MB/s tunnel is infeasible; a 4-frame slice is ~9 MB)
        ref = np.asarray(results["tiled"][1][0, 40:44].astype(jnp.float32))
        rngv = float(ref.max() - ref.min())
        for mode in ("stream2", "stream3"):
            if mode not in results:
                continue
            out = np.asarray(results[mode][1][0, 40:44].astype(jnp.float32))
            print(f"{mode} vs tiled PSNR (frames 40-43): "
                  f"{psnr(out, ref, max_val=rngv):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
