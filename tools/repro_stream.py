"""Bisect the streaming-decode TPU compile failure.

Runs pieces of the streaming chunk graph on the TPU one at a time:
  attn   — attention_stream at the production latent shape
  conv   — conv3d_stream chain at full resolution
  chunk  — the full first-chunk _decode_chunk
  chunk2 — a steady (non-first) chunk
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "attn"
    rng = np.random.RandomState(0)

    if which == "attn":
        from kandinsky5_tpu.models.vae import _attn_p
        from kandinsky5_tpu.models.vae_stream import attention_stream

        p = _attn_p(jax.random.PRNGKey(0), 512, jnp.bfloat16)
        x = jnp.asarray(rng.randn(1, 5, 64, 96, 512) * 0.1, jnp.bfloat16)

        @jax.jit
        def f(p, x):
            y, st = attention_stream(p, x, None, 4)
            return y

        t0 = time.perf_counter()
        y = f(p, x)
        sync(y)
        print(f"attn first chunk OK {time.perf_counter() - t0:.1f}s")

        @jax.jit
        def g(p, x, st):
            return attention_stream(p, x, st, 4)

        _, st = g(p, x, None)

        @jax.jit
        def h(p, x, st):
            y, _ = attention_stream(p, x, st, 4)
            return y

        x2 = jnp.asarray(rng.randn(1, 4, 64, 96, 512) * 0.1, jnp.bfloat16)
        t0 = time.perf_counter()
        sync(h(p, x2, st))
        print(f"attn steady chunk OK {time.perf_counter() - t0:.1f}s")

    elif which == "conv":
        from kandinsky5_tpu.models.vae_stream import conv3d_stream

        p = {"weight": jnp.asarray(rng.randn(3, 3, 3, 128, 128) * 0.05,
                                   jnp.bfloat16),
             "bias": jnp.zeros((128,), jnp.bfloat16)}
        x = jnp.asarray(rng.randn(1, 17, 512, 768, 128) * 0.1, jnp.bfloat16)

        @jax.jit
        def f(p, x):
            y, h = conv3d_stream(p, x, None)
            return y, h

        t0 = time.perf_counter()
        y, h = f(p, x)
        sync(y)
        print(f"conv first OK {time.perf_counter() - t0:.1f}s")

        @jax.jit
        def g(p, x, h):
            y, h2 = conv3d_stream(p, x, h)
            return y

        x2 = jnp.asarray(rng.randn(1, 16, 512, 768, 128) * 0.1, jnp.bfloat16)
        t0 = time.perf_counter()
        sync(g(p, x2, h))
        print(f"conv steady OK {time.perf_counter() - t0:.1f}s")

    elif which in ("chunk", "chunk2"):
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        from kandinsky5_tpu.models.vae import init_vae_params
        from kandinsky5_tpu.models.vae_stream import _decode_chunk

        params = init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        z = jnp.asarray(rng.randn(1, n + 1, 64, 96, 16), jnp.bfloat16)
        t0 = time.perf_counter()
        y, st = _decode_chunk(params, z, None, True, 4)
        sync(y)
        print(f"chunk first (n={n + 1}) OK {time.perf_counter() - t0:.1f}s")
        if which == "chunk2":
            z2 = jnp.asarray(rng.randn(1, n, 64, 96, 16), jnp.bfloat16)
            t0 = time.perf_counter()
            y2, st = _decode_chunk(params, z2, st, False, 4)
            sync(y2)
            print(f"chunk steady (n={n}) OK {time.perf_counter() - t0:.1f}s")
    elif which == "full":
        from kandinsky5_tpu.models.vae import init_vae_params
        from kandinsky5_tpu.models.vae_stream import streaming_decode

        params = init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        z = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.bfloat16)
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        t0 = time.perf_counter()
        sync(streaming_decode(params, z, chunk_lat=n))
        print(f"full stream compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        sync(streaming_decode(params, z, chunk_lat=n))
        print(f"full stream steady {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
