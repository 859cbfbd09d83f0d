"""Generate golden parity fixtures for the 2D-TAN variant from the reference
implementation (cone_2dtan/lib). Imported, never copied; the fixture npz
makes tests hermetic.

The reference map module hardcodes `.cuda()` (map_modules/__init__.py:8);
we no-op it to run on CPU.

Usage: python tools/gen_golden_tan.py
"""

from __future__ import annotations

import sys
from types import SimpleNamespace as NS

import numpy as np


def main():
    sys.path.insert(0, "/root/reference/cone_2dtan/lib")

    # the reference's config module needs easydict (not installed) — shim it
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

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU golden run
    torch.manual_seed(0)
    np.random.seed(0)

    # the reference modules import `core.config` at module import time only
    # for CONE_TAN itself; the sub-modules take cfg objects — we drive those
    # directly to avoid the global-config machinery.
    from models.frame_modules.frame_pool import FrameAvgPool
    from models.prop_modules.sparse import SparsePropMaxPool
    from models.fusion_modules.base_fusion import BaseFusion
    from models.map_modules.map_conv import MapConv
    from models.adapter_modules.adapter import VisualAdapter
    from models.loss import bce_rescale_loss

    H, D_T, NC = 64, 48, 64
    frame = FrameAvgPool(NS(INPUT_SIZE=H, HIDDEN_SIZE=H, KERNEL_SIZE=1, STRIDE=1))
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
    adapter = VisualAdapter(NS(INPUT_SIZE=H, HIDDEN_SIZE=H, NUM_LAYERS=2))
    for m in (frame, prop, fusion, mapconv, pred, adapter):
        m.eval()

    b, lq = 3, 10
    rng = np.random.default_rng(1)
    vis = rng.normal(size=(b, NC, H)).astype(np.float32)
    tok = rng.normal(size=(b, lq, D_T)).astype(np.float32)
    tok_mask = np.ones((b, lq), np.float32)
    tok_mask[1, 7:] = 0
    tok_mask[2, 4:] = 0
    tok[1, 7:] = 0
    tok[2, 4:] = 0

    with torch.no_grad():
        vis_h = frame(torch.tensor(vis).transpose(1, 2))           # (B, H, NC)
        map_h, map_mask = prop(vis_h)                              # (B, H, NC, NC)
        fused = fusion(torch.tensor(tok), torch.tensor(tok_mask)[..., None],
                       map_h, map_mask)
        conved = mapconv(fused, map_mask)
        scores = pred(conved) * map_mask                           # (B, 1, NC, NC)

    gt = [(3.2, 17.9), (40.0, 63.5), (0.0, 5.0)]

    # IoU targets, built with the reference's hull-union iou formula
    # (lib/core/eval.py:9-27) without importing its config-bound module
    def ref_iou(pred_spans, gt_span):
        pred_spans = np.asarray(pred_spans, np.float64)
        s, e = gt_span
        inter = np.maximum(
            0.0, np.minimum(pred_spans[:, 1], e) - np.maximum(pred_spans[:, 0], s)
        )
        union = np.maximum(
            0.0, np.maximum(pred_spans[:, 1], e) - np.minimum(pred_spans[:, 0], s)
        )
        return np.where(union > 0, inter / union, 0.0)

    cells = [[s, e + 1.0] for s in range(NC) for e in range(NC)]
    targets = np.stack(
        [ref_iou(cells, g).reshape(NC, NC) for g in gt]
    ).astype(np.float32)

    with torch.no_grad():
        loss_value, joint = bce_rescale_loss(
            scores, map_mask, torch.tensor(targets)[:, None],
            NS(MIN_IOU=0.3, MAX_IOU=0.7, BIAS=0.5),
        )

    blob = {
        "vis": vis, "tok": tok, "tok_mask": tok_mask,
        "map_mask": map_mask.numpy()[0, 0],
        "scores": scores.numpy()[:, 0],
        "targets": targets,
        "loss": np.float32(loss_value.item()),
        "vis_h": vis_h.numpy(),
        "map_h": map_h.numpy(),
        "fused": fused.numpy(),
        "conved": conved.numpy(),
    }
    mods = {
        "frame": frame, "fusion": fusion, "mapconv": mapconv, "pred": pred,
        "adapter": adapter,
    }
    for name, m in mods.items():
        for pname, p in m.state_dict().items():
            blob[f"w::{name}.{pname}"] = p.numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/tan_forward.npz", **blob)
    print(f"wrote tests/golden/tan_forward.npz: {len(blob)} arrays")


if __name__ == "__main__":
    main()
