"""Offline video clip-feature extraction -> packed .cfs store.

CLIP image features at a fixed fps, matching the reference pipeline
(feature_extraction/clip_extractor.py:100-176): ffmpeg decodes frames at
`fps` via a subprocess pipe, frames go through the CLIP vision tower in
batches, one row per frame.

ffmpeg decode and CLIP image preprocessing stay host-side; the vision
tower runs either on host torch (`engine="torch"`) or TPU-native through
the flax ClipVisionTower (`engine="flax"`, models/clip.py — parity-pinned
by tests/test_clip_parity.py). The EgoVLP video tower (divided space-time
ViT) is likewise TPU-native in models/egovlp.py, driven by
extract/egovlp_video.py; alternatively, EgoVLP clip features extracted
with the upstream release convert straight into a .cfs store via
`cone_tpu.cli convert-store --format pt_dir`.
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
    engine: str = "torch",
    _model=None, _processor=None,
) -> None:
    """videos: {clip_id: video_file_path} -> one .cfs store of (T, D) rows.

    `engine="torch"` runs the HF vision tower on `device` (host);
    `engine="flax"` runs the parity-tested flax ClipVisionTower
    (models/clip.py) on the default jax device — the TPU when available,
    making CLIP extraction accelerator-native like the EgoVLP tower.
    `_model`/`_processor` inject preloaded instances (tests)."""
    import torch
    from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection

    processor = _processor or CLIPImageProcessor.from_pretrained(model_name)
    model = (_model or
             CLIPVisionModelWithProjection.from_pretrained(model_name)).eval()

    encode = (clip_vision_flax_encoder(model, batch_size)
              if engine == "flax" else None)
    if encode is None:
        model = model.to(device)

    items = {}
    with torch.no_grad():
        for clip_id, path in videos.items():
            frames = decode_frames(path, fps)
            feats: List[np.ndarray] = []
            for i in range(0, len(frames), batch_size):
                batch = list(frames[i : i + batch_size])
                if encode is not None:
                    pix = processor(images=batch,
                                    return_tensors="np")["pixel_values"]
                    feats.append(encode(pix))
                else:
                    inputs = processor(images=batch,
                                       return_tensors="pt").to(device)
                    feats.append(model(**inputs).image_embeds.cpu().numpy())
            items[clip_id] = np.concatenate(feats).astype(np.float32)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_packed_store(out_path, items)


def clip_vision_flax_encoder(model, batch_size: int):
    """(B, 3, H, W) preprocessed pixels -> (B, D) image features through the
    jitted flax tower at a fixed batch shape (one compiled program)."""
    import jax
    import jax.numpy as jnp

    from cone_tpu.models.clip import (ClipVisionTower,
                                      clip_vision_state_dict_to_params,
                                      vision_config_from_hf)

    cfg = vision_config_from_hf(model.config)
    params = clip_vision_state_dict_to_params(model.state_dict(),
                                              cfg.num_layers)
    tower = ClipVisionTower(cfg)
    apply = jax.jit(lambda px: tower.apply({"params": params}, px))

    def encode(pixels: np.ndarray) -> np.ndarray:
        n = pixels.shape[0]
        if n < batch_size:  # static batch: pad with repeated frames
            pixels = np.concatenate(
                [pixels, np.repeat(pixels[-1:], batch_size - n, 0)])
        out = apply(jnp.asarray(pixels.transpose(0, 2, 3, 1)))  # NHWC
        return np.asarray(out, np.float32)[:n]

    return encode
