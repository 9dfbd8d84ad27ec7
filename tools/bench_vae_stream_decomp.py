"""Stage decomposition of the streaming VAE decode's wall clock.

VERDICT r4 weak #5: stream decode sits at 7.6 s vs a 4.5 s analytic
conv floor (59% of SoL) and the non-conv residue was attributed but
never measured. This tool times the full streaming decode with stages
ABLATED (computing garbage of identical shapes), so adjacent deltas
price each stage *in situ* — including the XLA relayout/fusion effects
a standalone microbench misses:

  full       the production path
  no_attn    mid-block attention replaced with identity
  no_gnsilu  every GroupNorm+SiLU prologue removed (plain convs)
  no_hist    causal history dropped (first-chunk edge pad every chunk:
             same chunk shapes minus the 2 carried frames per conv)
  conv_only  no_attn + no_gnsilu (the Pallas conv tower + upsample
             repeats + residual adds alone)

jax.clear_caches() between variants — the patched globals live inside
the same jitted _decode_chunk. Run on the TPU:

    timeout 3000 python tools/bench_vae_stream_decomp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :1, :1].astype(jnp.float32)))


def main():
    from kandinsky5_tpu.models import vae_stream
    from kandinsky5_tpu.models.vae import init_vae_params

    params = init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.bfloat16)

    orig_attn = vae_stream.attention_stream
    orig_gsc = vae_stream._gn_silu_conv_stream
    orig_conv = vae_stream.conv3d_stream

    def attn_off(p, x, st, attn_past):
        return x, {"k": jnp.zeros((1,), x.dtype),
                   "v": jnp.zeros((1,), x.dtype),
                   "filled": jnp.zeros((), jnp.int32)}

    def gnsilu_off(p_norm, p_conv, x, hist):
        return vae_stream.conv3d_stream(p_conv, x, hist)

    def hist_off(p, x, hist):
        y, h = orig_conv(p, x, None)
        return y, h

    variants = [
        ("full", {}),
        ("no_attn", {"attention_stream": attn_off}),
        ("no_gnsilu", {"_gn_silu_conv_stream": gnsilu_off}),
        ("no_hist", {"conv3d_stream": hist_off}),
        ("conv_only", {"attention_stream": attn_off,
                       "_gn_silu_conv_stream": gnsilu_off}),
    ]
    results = {}
    for name, patches in variants:
        jax.clear_caches()
        for attr, fn in patches.items():
            setattr(vae_stream, attr, fn)
        # gnsilu_off closes over vae_stream.conv3d_stream at call time,
        # so the hist patch composes if ever combined
        try:
            t0 = time.perf_counter()
            sync(vae_stream.streaming_decode(params, z))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sync(vae_stream.streaming_decode(params, z))
                best = min(best, time.perf_counter() - t0)
            results[name] = best
            print(f"  {name:10s}: {best:6.2f} s  (compile+first "
                  f"{compile_s:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:10s}: FAIL {type(e).__name__}: {e}"[:200],
                  flush=True)
        finally:
            vae_stream.attention_stream = orig_attn
            vae_stream._gn_silu_conv_stream = orig_gsc
            vae_stream.conv3d_stream = orig_conv
    if "full" in results:
        f = results["full"]
        for k in ("no_attn", "no_gnsilu", "no_hist"):
            if k in results:
                print(f"  {k[3:]:10s} stage cost: {f - results[k]:6.2f} s")
        if "conv_only" in results:
            print(f"  conv+upsample+residual floor: "
                  f"{results['conv_only']:6.2f} s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
