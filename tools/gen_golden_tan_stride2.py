"""Golden fixture for the TARGET_STRIDE=2 (MAD) 2D-TAN geometry from the
reference implementation: NUM_SAMPLE_CLIPS=128 raw window, frame avg-pool
kernel=stride=2 -> 64x64 proposal map, plus the cell -> seconds decode and
matching-proposal scaling (cone_2dtan/experiments/mad/*.yaml:13-16,
moment_localization/test.py:293-297,426).

Imported from /root/reference, never copied; the fixture npz keeps the
tests hermetic. Usage: python tools/gen_golden_tan_stride2.py
"""

from __future__ import annotations

import sys
from types import SimpleNamespace as NS

import numpy as np


def main():
    sys.path.insert(0, "/root/reference/cone_2dtan/lib")

    import types

    class _EDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    easydict = types.ModuleType("easydict")
    easydict.EasyDict = _EDict
    sys.modules.setdefault("easydict", easydict)

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    np.random.seed(0)

    from models.frame_modules.frame_pool import FrameAvgPool
    from models.fusion_modules.base_fusion import BaseFusion
    from models.map_modules.map_conv import MapConv
    from models.prop_modules.sparse import SparsePropMaxPool

    H, D_T, NC, STRIDE = 64, 48, 64, 2
    L_RAW = NC * STRIDE  # NUM_SAMPLE_CLIPS = 128
    frame = FrameAvgPool(
        NS(INPUT_SIZE=H, HIDDEN_SIZE=H, KERNEL_SIZE=STRIDE, STRIDE=STRIDE)
    )
    prop = SparsePropMaxPool(NS(NUM_SCALE_LAYERS=[16, 8, 8]))
    fusion = BaseFusion(
        NS(HIDDEN_SIZE=H, TXT_INPUT_SIZE=D_T, TXT_HIDDEN_SIZE=H,
           LSTM=NS(NUM_LAYERS=3, BIDIRECTIONAL=False))
    )
    mapconv = MapConv(
        NS(INPUT_SIZE=H, HIDDEN_SIZES=[H, H, H, H], KERNEL_SIZES=[9, 9, 9, 9],
           STRIDES=[1, 1, 1, 1], PADDINGS=[16, 0, 0, 0], DILATIONS=[1, 1, 1, 1])
    )
    pred = torch.nn.Conv2d(H, 1, 1, 1)
    for m in (frame, prop, fusion, mapconv, pred):
        m.eval()

    b, lq = 3, 10
    rng = np.random.default_rng(7)
    vis = rng.normal(size=(b, L_RAW, H)).astype(np.float32)
    tok = rng.normal(size=(b, lq, D_T)).astype(np.float32)
    tok_mask = np.ones((b, lq), np.float32)
    tok_mask[1, 7:] = 0
    tok_mask[2, 4:] = 0
    tok[1, 7:] = 0
    tok[2, 4:] = 0

    with torch.no_grad():
        vis_h = frame(torch.tensor(vis).transpose(1, 2))  # (B, H, NC)
        assert vis_h.shape[-1] == NC, vis_h.shape
        map_h, map_mask = prop(vis_h)
        fused = fusion(torch.tensor(tok), torch.tensor(tok_mask)[..., None],
                       map_h, map_mask)
        conved = mapconv(fused, map_mask)
        scores = pred(conved) * map_mask  # (B, 1, NC, NC)

    # reference decode of the top cell per item: cell (s, e) -> e+1 ->
    # * TARGET_STRIDE -> (+ video_start) * CLIP_LEN
    # (moment_localization/test.py:281,293,297)
    clip_len, video_start = 0.2, 250
    sc = scores[:, 0].numpy()
    decoded = []
    for i in range(b):
        masked = np.where(map_mask[0, 0].numpy() > 0, sc[i], -np.inf)
        s_idx, e_idx = np.unravel_index(np.argmax(masked), masked.shape)
        span = (np.array([s_idx, e_idx + 1]) * STRIDE + video_start) * clip_len
        decoded.append(span)
    decoded = np.stack(decoded).astype(np.float32)

    blob = {
        "vis": vis, "tok": tok, "tok_mask": tok_mask,
        "map_mask": map_mask.numpy()[0, 0],
        "scores": sc,
        "decoded_top1": decoded,
        "clip_len": np.float32(clip_len),
        "video_start": np.int32(video_start),
    }
    for name, m in {"frame": frame, "fusion": fusion, "mapconv": mapconv,
                    "pred": pred}.items():
        for pname, p in m.state_dict().items():
            blob[f"w::{name}.{pname}"] = p.numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/tan_forward_stride2.npz", **blob)
    print(f"wrote tests/golden/tan_forward_stride2.npz: {len(blob)} arrays")


if __name__ == "__main__":
    main()
