"""Golden fixture: reference SetCriterion with MULTIPLE target spans per
sample (max_windows > 1) — pins the multi-span Hungarian gather path.

Usage: python tools/gen_golden_multispan.py
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(5)
    np.random.seed(5)

    sys.path.insert(0, "tools")
    from gen_golden import build_args

    from cone.model import build_model

    margs = build_args()
    model, criterion = build_model(margs)
    model.eval()
    criterion.eval()

    b, lq, lv = 3, 6, 20
    rng = np.random.default_rng(11)
    src_txt = rng.normal(size=(b, lq, margs.t_feat_dim)).astype(np.float32)
    src_txt_mask = np.ones((b, lq), np.float32)
    src_vid = rng.normal(size=(b, lv, margs.v_motion_feat_dim)).astype(np.float32)
    src_vid_mask = np.ones((b, lv), np.float32)

    with torch.no_grad():
        out = model(
            torch.tensor(src_txt), torch.tensor(src_txt_mask),
            torch.tensor(src_vid), torch.tensor(src_vid_mask),
        )

    # ragged target spans: 2, 3, 1 per sample
    spans = [
        np.array([[0.3, 0.2], [0.7, 0.15]], np.float32),
        np.array([[0.2, 0.1], [0.5, 0.3], [0.8, 0.2]], np.float32),
        np.array([[0.5, 0.8]], np.float32),
    ]
    sal_pos = np.array([[3], [2], [10]], np.int64)
    sal_neg = np.array([[15], [0], [1]], np.int64)
    targets = {
        "span_labels": [{"spans": torch.tensor(s)} for s in spans],
        "saliency_pos_labels": torch.tensor(sal_pos),
        "saliency_neg_labels": torch.tensor(sal_neg),
    }
    with torch.no_grad():
        loss_dict = criterion(out, targets, None)

    nt = max(len(s) for s in spans)
    padded = np.zeros((b, nt, 2), np.float32)
    mask = np.zeros((b, nt), np.float32)
    for i, s in enumerate(spans):
        padded[i, : len(s)] = s
        mask[i, : len(s)] = 1

    blob = {
        "src_txt": src_txt, "src_txt_mask": src_txt_mask,
        "src_vid": src_vid, "src_vid_mask": src_vid_mask,
        "tgt_spans": padded, "span_mask": mask,
        "sal_pos": sal_pos, "sal_neg": sal_neg,
    }
    for k, v in loss_dict.items():
        blob[f"loss_{k}"] = np.float32(float(v))
    for name, p in model.state_dict().items():
        blob[f"w::{name}"] = p.numpy()

    np.savez_compressed("tests/golden/cone_multispan.npz", **blob)
    print(f"wrote tests/golden/cone_multispan.npz: {len(blob)} arrays")


if __name__ == "__main__":
    main()
