"""Offline video clip-feature extraction -> packed .cfs store.

CLIP image features at a fixed fps, matching the reference pipeline
(feature_extraction/clip_extractor.py:100-176): ffmpeg decodes frames at
`fps` via a subprocess pipe, frames go through the CLIP vision tower in
batches, one row per frame.

Host-side preprocessing (torch + ffmpeg, out of TPU scope). The EgoVLP
video tower (divided space-time ViT) is re-implemented TPU-native in
models/egovlp.py and driven by extract/egovlp_video.py; alternatively,
EgoVLP clip features extracted with the upstream release convert straight
into a .cfs store via `cone_tpu.cli convert-store --format pt_dir`.
"""

from __future__ import annotations

import os
import subprocess
from typing import Dict, List

import numpy as np

from cone_tpu.data.store import write_packed_store


def decode_frames(video_path: str, fps: float, size: int = 224) -> np.ndarray:
    """ffmpeg -> (T, size, size, 3) uint8 RGB frames at `fps`."""
    cmd = [
        "ffmpeg", "-nostdin", "-i", video_path,
        "-vf", f"fps={fps},scale={size}:{size}",
        "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
        "-loglevel", "error",
    ]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    n = len(raw) // (size * size * 3)
    return np.frombuffer(raw[: n * size * size * 3], np.uint8).reshape(
        n, size, size, 3
    )


def extract_clip_video(
    videos: Dict[str, str],
    out_path: str,
    model_name: str = "openai/clip-vit-base-patch32",
    fps: float = 5.0,
    batch_size: int = 64,
    device: str = "cpu",
) -> None:
    """videos: {clip_id: video_file_path} -> one .cfs store of (T, D) rows."""
    import torch
    from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection

    processor = CLIPImageProcessor.from_pretrained(model_name)
    model = CLIPVisionModelWithProjection.from_pretrained(model_name)
    model = model.to(device).eval()

    items = {}
    with torch.no_grad():
        for clip_id, path in videos.items():
            frames = decode_frames(path, fps)
            feats: List[np.ndarray] = []
            for i in range(0, len(frames), batch_size):
                inputs = processor(
                    images=list(frames[i : i + batch_size]), return_tensors="pt"
                ).to(device)
                feats.append(model(**inputs).image_embeds.cpu().numpy())
            items[clip_id] = np.concatenate(feats).astype(np.float32)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_packed_store(out_path, items)
