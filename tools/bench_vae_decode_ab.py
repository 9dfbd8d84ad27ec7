"""Full VAE decode at the production 5s shape, honoring
KANDINSKY5_TPU_PALLAS_CONV from the environment — run twice (flag 0/1)
to A/B the all-Pallas conv tower (VERDICT r3 item 5: decode 9.2 s ->
target <=7 s) against the XLA lowering.

Prints compile+first and steady seconds for the requested decode mode
and dumps a 4-frame fp32 slice to --out for cross-run PSNR.

Run:
  PYTHONPATH=.:/root/.axon_site KANDINSKY5_TPU_PALLAS_CONV=0 \
      python tools/bench_vae_decode_ab.py --out /tmp/vae_xla.npy
  PYTHONPATH=.:/root/.axon_site KANDINSKY5_TPU_PALLAS_CONV=1 \
      python tools/bench_vae_decode_ab.py --out /tmp/vae_pallas.npy
"""
import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--mode", default="stream", choices=["stream", "tiled"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params

    flag = os.environ.get("KANDINSKY5_TPU_PALLAS_CONV", "")
    print(f"devices: {jax.devices()}  PALLAS_CONV={flag!r}  mode={args.mode}")

    vae = HunyuanVideoVAE(
        init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.randn(1, 31, 64, 96, 16), jnp.bfloat16)

    def run():
        v = vae.decode(z, mode=args.mode)
        # device->host scalar pull: a TRUE sync on the tunneled axon
        # platform (block_until_ready returned before execution there)
        float(jnp.sum(v[0, -1, :4, :4].astype(jnp.float32)))
        return v

    t0 = time.perf_counter()
    v = run()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    v = run()
    steady = time.perf_counter() - t0
    print(f"steady: {steady:.1f}s   video {v.shape} {v.dtype}")
    if args.out:
        np.save(args.out, np.asarray(v[0, 40:44].astype(jnp.float32)))
        print(f"slice saved: {args.out}")


if __name__ == "__main__":
    main()
