"""MovieGen-bench runner: batch generation over the evaluation prompt set.

The reference ships benchmark/moviegen_bench.csv (1,026 prompts with
expanded/ru variants) for side-by-side quality evals (reference
README.md:124-126); it has no runner. This script generates videos for a
slice of the set with any of the eight configs.

Usage:
    python benchmark/run_moviegen_bench.py \
        --config kandinsky5_tpu/configs/config_5s_distil.yaml \
        --csv /path/to/moviegen_bench.csv --out ./bench_out \
        --limit 8 --column expanded_prompt
"""

import argparse
import csv
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument(
        "--csv", required=True,
        help="path to the MovieGen prompt CSV (the reference ships it as "
             "benchmark/moviegen_bench.csv in its repo; it is prompt DATA, "
             "deliberately not vendored here)")
    p.add_argument("--out", default="./bench_out")
    p.add_argument("--column", default="expanded_prompt",
                   choices=["prompt", "expanded_prompt", "ru_prompt",
                            "ru_expanded_prompt"])
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--duration", type=int, default=5)
    p.add_argument("--seed", type=int, default=6554)
    args = p.parse_args()

    from kandinsky5_tpu.pipeline import get_T2V_pipeline

    # provenance: the published MovieGen set's digest (MOVIEGEN_CSV.md);
    # custom prompt CSVs run fine but are labeled as such
    import hashlib

    MOVIEGEN_SHA256 = ("93bc42d6c0669b02d63721b3e435d26efe4df382"
                       "fbd73ea093a9b116ffc59857")
    with open(args.csv, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    print("csv provenance: "
          + ("MATCHES the published MovieGen bench set"
             if digest == MOVIEGEN_SHA256
             else f"custom prompt set (sha256 {digest[:16]}…, not the "
                  f"published MovieGen CSV — see benchmark/MOVIEGEN_CSV.md)"))

    with open(args.csv) as f:
        rows = list(csv.DictReader(f))
    rows = rows[args.offset:]
    if args.limit is not None:
        rows = rows[:args.limit]
    print(f"{len(rows)} prompts from {args.csv} [{args.column}]")

    pipe = get_T2V_pipeline(conf_path=args.config)
    os.makedirs(args.out, exist_ok=True)

    times = []
    for i, row in enumerate(rows):
        prompt = row[args.column]
        out_path = os.path.join(args.out, f"{args.offset + i:05d}.mp4")
        t0 = time.time()
        pipe(prompt, time_length=args.duration, seed=args.seed,
             expand_prompts=False,  # the csv already carries expansions
             save_path=out_path, progress=False)
        dt = time.time() - t0
        times.append(dt)
        print(f"[{i + 1}/{len(rows)}] {dt:.1f}s {out_path}")

    if times:
        steady = times[1:] or times
        print(f"mean latency (post-compile): {sum(steady) / len(steady):.1f}s")


if __name__ == "__main__":
    main()
