"""Generation CLI — flag-compatible with the reference test.py
(/root/reference/test.py:32-123).

Example:
    python cli.py --config kandinsky5_tpu/configs/config_5s_sft.yaml \
        --prompt "A dog in red hat" --output_filename out.mp4
"""

import argparse
import time


def parse_args():
    p = argparse.ArgumentParser("kandinsky5_tpu text-to-video generation")
    p.add_argument("--config", type=str, default=None,
                   help="path to a configs/*.yaml file")
    p.add_argument("--prompt", type=str, default="A dog in red hat")
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--width", type=int, default=768, choices=[512, 768])
    p.add_argument("--height", type=int, default=512, choices=[512, 768])
    p.add_argument("--video_duration", type=int, default=5,
                   help="seconds; 0 generates a single image")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--expand_prompt", type=int, default=1, choices=[0, 1])
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--guidance_weight", type=float, default=None)
    p.add_argument("--scheduler_scale", type=float, default=5.0)
    p.add_argument("--output_filename", type=str, default="output.mp4")
    p.add_argument("--cache_dir", type=str, default="./weights/")
    p.add_argument("--offload", action="store_true")
    p.add_argument("--magcache", action="store_true")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel width over the local TPU mesh")
    return p.parse_args()


def validate_args(args):
    if args.width == args.height == 768:
        raise ValueError(
            "(768, 768) resolution is not supported; use (512, 512), "
            "(512, 768) or (768, 512)")


def main():
    args = parse_args()
    validate_args(args)

    from kandinsky5_tpu.pipeline import DEFAULT_NEGATIVE, get_T2V_pipeline

    pipe = get_T2V_pipeline(
        conf_path=args.config, cache_dir=args.cache_dir,
        offload=args.offload, magcache=args.magcache, tp=args.tp)

    start = time.time()
    pipe(
        args.prompt,
        time_length=args.video_duration,
        width=args.width,
        height=args.height,
        seed=args.seed,
        num_steps=args.sample_steps,
        guidance_weight=args.guidance_weight,
        scheduler_scale=args.scheduler_scale,
        negative_caption=(DEFAULT_NEGATIVE if args.negative_prompt is None
                          else args.negative_prompt),
        expand_prompts=bool(args.expand_prompt),
        save_path=args.output_filename,
    )
    print(f"generated in {time.time() - start:.1f}s -> {args.output_filename}")


if __name__ == "__main__":
    main()
