"""Host-side IO: checkpoint shard loading and video/image writing.

The media writers replace the reference's torchvision/PIL output path
(/root/reference/kandinsky/t2v_pipeline.py:165-189): mp4 at 24 fps via
imageio-ffmpeg, PNG stills for image mode.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def load_sharded_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a safetensors checkpoint (single file, HF shard index, or a
    directory of shards) into float32 numpy arrays.

    Uses the torch loader because numpy safetensors cannot represent
    bfloat16 shards.
    """
    from safetensors import safe_open

    if os.path.isfile(path):
        files = [path]
    else:
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                shard_names = sorted(set(json.load(f)["weight_map"].values()))
            files = [os.path.join(path, s) for s in shard_names]
        else:
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".safetensors")
            )
    out: Dict[str, np.ndarray] = {}
    for file in files:
        with safe_open(file, framework="pt") as f:
            for key in f.keys():
                t = f.get_tensor(key)
                out[key] = t.float().numpy()
    return out


def write_video(path: str, frames: np.ndarray, fps: int = 24,
                crf: int = 5) -> None:
    """frames: (T, H, W, 3) uint8 -> mp4 (reference writes crf 5 @ 24fps,
    t2v_pipeline.py:183-188).

    Encoder chain: native C++ writer (native/video_writer.cc, piping
    y4m into ffmpeg) -> imageio/ffmpeg -> raw .y4m via the native
    writer when no encoder binary exists (this environment ships none).
    """
    from kandinsky5_tpu.utils.native_video import write_video_native

    if write_video_native(path, frames, fps=fps, crf=crf):
        return
    try:
        import imageio.v2 as imageio

        writer = imageio.get_writer(
            path, fps=fps, codec="libx264", quality=None,
            ffmpeg_params=["-crf", str(crf), "-pix_fmt", "yuv420p"])
        try:
            for frame in frames:
                writer.append_data(frame)
        finally:
            writer.close()
        return
    except Exception:
        pass
    y4m = path.rsplit(".", 1)[0] + ".y4m"
    if not write_video_native(y4m, frames, fps=fps):
        raise RuntimeError("no usable video encoder (native/ffmpeg/imageio)")
    print(f"note: no mp4 encoder available; wrote raw {y4m}")


def write_image(path: str, frame: np.ndarray) -> None:
    """frame: (H, W, 3) uint8 -> PNG."""
    import imageio.v2 as imageio

    imageio.imwrite(path, frame)
