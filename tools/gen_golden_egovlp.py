"""Golden fixture for the EgoVLP video tower from the reference
SpaceTimeTransformer (run_on_video/egovlp/video_transformer.py), run at a
tiny configuration (same architecture, small dims). timm is not installed —
the few timm.models.layers symbols the reference uses are shimmed.

Usage: python tools/gen_golden_egovlp.py
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _shim_timm():
    import torch
    from torch import nn

    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = lambda t, std=1.0: nn.init.trunc_normal_(t, std=std)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    timm.models = models
    models.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def main():
    _shim_timm()
    sys.path.insert(0, "/root/reference/run_on_video")
    import torch

    torch.manual_seed(0)
    np.random.seed(0)

    from egovlp.video_transformer import SpaceTimeTransformer

    img, patch, dim, depth, heads, frames = 32, 16, 64, 2, 4, 3
    model = SpaceTimeTransformer(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=heads, num_frames=frames, qkv_bias=True,
        time_init="zeros", attention_style="frozen-in-time",
    )
    model.head = torch.nn.Identity()
    model.pre_logits = torch.nn.Identity()
    vid_proj = torch.nn.Linear(dim, 16)
    model.eval()
    vid_proj.eval()

    # give zero-initialized params (time attention, cls, temporal embed)
    # random values so parity is a real test
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    b = 2
    rng = np.random.default_rng(3)
    frames_np = rng.normal(size=(b, frames, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        cls_feat = model(torch.tensor(frames_np))
        projected = vid_proj(cls_feat)

    blob = {
        "frames": frames_np,
        "cls_feat": cls_feat.numpy(),
        "projected": projected.numpy(),
        "cfg": np.array([img, patch, dim, depth, heads, frames, 16]),
    }
    for name, p in model.state_dict().items():
        blob[f"w::video_model.{name}"] = p.numpy()
    for name, p in vid_proj.state_dict().items():
        blob[f"w::vid_proj.{name}"] = p.numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/egovlp_tower.npz", **blob)
    print(f"wrote tests/golden/egovlp_tower.npz: {len(blob)} arrays")


if __name__ == "__main__":
    main()
