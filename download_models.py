"""Download the released checkpoints into the standard weights layout.

Equivalent of the reference download_models.py (
/root/reference/download_models.py:6-74): fetches the eight DiT
checkpoints plus the HunyuanVideo VAE, Qwen2.5-VL-7B-Instruct and CLIP
ViT-L/14 from the HF hub into ``./weights/``, the directory layout the
configs point at.

Usage:
    python download_models.py [--cache_dir ./weights/] [--models sft_5s,...]
"""

import argparse
import os

DIT_REPOS = {
    "sft_5s": "ai-forever/Kandinsky-5.0-T2V-Lite-sft-5s",
    "sft_10s": "ai-forever/Kandinsky-5.0-T2V-Lite-sft-10s",
    "pretrain_5s": "ai-forever/Kandinsky-5.0-T2V-Lite-pretrain-5s",
    "pretrain_10s": "ai-forever/Kandinsky-5.0-T2V-Lite-pretrain-10s",
    "nocfg_5s": "ai-forever/Kandinsky-5.0-T2V-Lite-nocfg-5s",
    "nocfg_10s": "ai-forever/Kandinsky-5.0-T2V-Lite-nocfg-10s",
    "distilled16steps_5s": "ai-forever/Kandinsky-5.0-T2V-Lite-distilled16steps-5s",
    "distilled16steps_10s": "ai-forever/Kandinsky-5.0-T2V-Lite-distilled16steps-10s",
}

VAE_REPO = "hunyuanvideo-community/HunyuanVideo"
QWEN_REPO = "Qwen/Qwen2.5-VL-7B-Instruct"
CLIP_REPO = "openai/clip-vit-large-patch14"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cache_dir", type=str, default="./weights/")
    parser.add_argument(
        "--models", type=str, default=",".join(DIT_REPOS),
        help="comma-separated subset of: " + ", ".join(DIT_REPOS))
    args = parser.parse_args()

    from huggingface_hub import snapshot_download

    os.makedirs(args.cache_dir, exist_ok=True)

    for name in args.models.split(","):
        name = name.strip()
        if not name:
            continue
        repo = DIT_REPOS[name]
        print(f"downloading {repo} ...")
        snapshot_download(repo_id=repo, allow_patterns="model/*",
                          local_dir=args.cache_dir)

    print(f"downloading {VAE_REPO} (vae) ...")
    snapshot_download(repo_id=VAE_REPO, allow_patterns="vae/*",
                      local_dir=args.cache_dir)
    print(f"downloading {QWEN_REPO} ...")
    snapshot_download(repo_id=QWEN_REPO,
                      local_dir=os.path.join(args.cache_dir, "text_encoder"))
    print(f"downloading {CLIP_REPO} ...")
    snapshot_download(repo_id=CLIP_REPO,
                      local_dir=os.path.join(args.cache_dir, "text_encoder2"))
    print("done.")


if __name__ == "__main__":
    main()
