"""TPU-native EgoVLP clip-feature extraction.

The reference extracts EgoVLP features with torch on GPU
(run_on_video/egovlp_extrator.py:114-137: decord frames @1.875 fps, 4
frames per clip, batches of 4 clips). Here the tower is the flax
EgoVlpVideoTower (models/egovlp.py, parity-tested), so extraction jits onto
the TPU; frames come from ffmpeg.

Normalization matches the reference VideoLoader (egovlp_extrator.py:74-90):
resize to 224, scale to [0,1], ImageNet mean/std.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cone_tpu.data.store import write_packed_store
from cone_tpu.extract.video import decode_frames
from cone_tpu.models.egovlp import EgoVlpConfig, EgoVlpVideoTower

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _shim_parse_config():
    """The released EgoVLP checkpoint pickles a `parse_config.ConfigParser`
    object; register a dummy module so torch.load can unpickle (this is the
    entire reason the reference ships parse_config.py — its header comment
    says so, parse_config.py:1-5)."""
    import sys
    import types

    if "parse_config" in sys.modules:
        return

    mod = types.ModuleType("parse_config")

    class ConfigParser:  # attributes restored straight from the pickle
        def __init__(self, *a, **k):
            pass

    mod.ConfigParser = ConfigParser
    sys.modules["parse_config"] = mod


def load_egovlp_params(checkpoint_path: str, cfg: EgoVlpConfig,
                       load_temporal_fix: str = "zeros"):
    """Released EgoVLP checkpoint (torch) -> flax param tree.

    Passing the tower geometry activates the reference's checkpoint-compat
    shim (egovlp/model.py:137-178): a checkpoint trained at a different
    num_frames is truncated / zero-filled / bilinearly interpolated per
    `load_temporal_fix`; a spatial-resolution mismatch raises like the
    reference instead of producing garbage."""
    import torch

    from cone_tpu.models.egovlp import egovlp_state_dict_to_params

    _shim_parse_config()
    state = torch.load(checkpoint_path, map_location="cpu",
                       weights_only=False)
    sd = state.get("state_dict", state)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    n_side = cfg.img_size // cfg.patch_size
    return egovlp_state_dict_to_params(
        sd, depth=cfg.depth, num_frames=cfg.num_frames,
        load_temporal_fix=load_temporal_fix,
        num_patches=n_side * n_side + 1)


def extract_egovlp_video(
    videos: Dict[str, str],
    out_path: str,
    checkpoint_path: str,
    fps: float = 1.875,
    frames_per_clip: int = 4,
    clip_batch: int = 8,
    cfg: EgoVlpConfig = EgoVlpConfig(),
) -> None:
    """videos: {clip_id: path} -> .cfs store of (T_clips, 256) features."""
    import jax
    import jax.numpy as jnp

    params = load_egovlp_params(checkpoint_path, cfg)
    model = EgoVlpVideoTower(cfg)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    items = {}
    for clip_id, path in videos.items():
        frames = decode_frames(path, fps, size=cfg.img_size)  # (T, H, W, 3)
        t = len(frames) // frames_per_clip * frames_per_clip
        if t == 0:
            # shorter than one clip window (or a decode failure): skip
            # loudly instead of crashing the whole batch run at the final
            # np.concatenate and losing every extracted video
            print(f"WARNING: {clip_id} ({path}): {len(frames)} frames"
                  f" < frames_per_clip={frames_per_clip}; skipped")
            continue
        clips = frames[:t].reshape(-1, frames_per_clip, cfg.img_size,
                                   cfg.img_size, 3)
        clips = (clips.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

        feats = []
        for i in range(0, len(clips), clip_batch):
            batch = clips[i : i + clip_batch]
            if len(batch) < clip_batch:  # keep shapes static for jit
                pad = np.zeros(
                    (clip_batch - len(batch),) + batch.shape[1:], np.float32
                )
                out = np.asarray(fwd(params, jnp.asarray(np.concatenate([batch, pad]))))
                feats.append(out[: len(batch)])
            else:
                feats.append(np.asarray(fwd(params, jnp.asarray(batch))))
        items[clip_id] = np.concatenate(feats).astype(np.float32)
    write_packed_store(out_path, items)
