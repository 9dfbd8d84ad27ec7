"""End-to-end parity gate vs the PyTorch reference (requires the real
checkpoints under ./weights/ and a CUDA/CPU box that can run the
reference — not available in the build environment, so this tool is the
recipe for the gate rather than a CI test).

1. runs the reference pipeline with a fixed seed, saving (a) the initial
   noise, (b) the final latents, (c) decoded frames;
2. runs this framework with the SAME noise injected
   (sampling.generate_latents(noise=...) — torch RNG streams cannot be
   reproduced in JAX);
3. reports latent stats and decoded-frame PSNR
   (target: PSNR > 35 dB, BASELINE.md).

Usage:
    python tools/parity_check.py --config kandinsky5_tpu/configs/config_5s_distil.yaml \
        --reference-dump ref_dump.npz [--prompt "..."]

To produce ref_dump.npz on a reference-capable machine:
    python tools/parity_check.py --make-reference-dump ref_dump.npz ...
"""

import argparse

import numpy as np


def run_ours(conf_path: str, dump: dict, prompt: str):
    import jax.numpy as jnp

    from kandinsky5_tpu.pipeline import get_T2V_pipeline
    from kandinsky5_tpu.sampling import generate_latents
    from kandinsky5_tpu.utils.metrics import latent_stats, psnr

    pipe = get_T2V_pipeline(conf_path=conf_path)
    cond = pipe.text_embedder.encode([prompt], "video")
    uncond = pipe.text_embedder.encode([dump.get("negative", "")], "video")
    spec = pipe._spec(pipe.conf.model.num_steps,
                      pipe.conf.model.guidance_weight, 5.0)
    noise = jnp.asarray(dump["noise"])  # (1, T, H, W, C), reference RNG
    latents = generate_latents(
        pipe.dit_params, spec, noise.shape,
        {"text_embeds": cond.text_embeds, "pooled_embed": cond.pooled_embed,
         "mask": cond.mask},
        {"text_embeds": uncond.text_embeds,
         "pooled_embed": uncond.pooled_embed, "mask": uncond.mask},
        seed=0, noise=noise)
    print("latents:", latent_stats(np.asarray(latents), dump["latents"]))
    frames = pipe.decode_latents(latents)
    score = psnr(frames, dump["frames"])
    print(f"decoded-frame PSNR: {score:.2f} dB (target > 35)")
    return score


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--reference-dump", required=True)
    p.add_argument("--prompt", default="A dog in red hat")
    args = p.parse_args()
    dump = dict(np.load(args.reference_dump, allow_pickle=True))
    run_ours(args.config, dump, args.prompt)


if __name__ == "__main__":
    main()
