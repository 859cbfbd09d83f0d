"""Generate golden parity fixtures from the reference PyTorch implementation.

Runs the reference CONE model + SetCriterion (imported from /root/reference,
never copied) on seeded random weights/inputs and dumps everything to
tests/golden/*.npz. The committed fixtures make the parity tests hermetic —
they do not need torch or the reference checkout at test time.

Usage: python tools/gen_golden.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import sys
from types import SimpleNamespace

import numpy as np


def build_args(**over):
    base = dict(
        device=SimpleNamespace(type="cpu"),
        t_feat_dim=36,
        v_motion_feat_dim=40,
        v_appear_feat_dim=36,
        num_queries=5,
        input_dropout=0.5,
        aux_loss=True,
        span_loss_type="l1",
        adapter_module="linear",
        use_txt_pos=False,
        n_input_proj=2,
        hidden_dim=256,
        nheads=8,
        enc_layers=2,
        dec_layers=2,
        dim_feedforward=1024,
        dropout=0.1,
        pre_norm=False,
        position_embedding="sine",
        max_q_l=20,
        max_v_l=20,
        set_cost_span=10,
        set_cost_giou=1,
        set_cost_class=4,
        span_loss_coef=10,
        giou_loss_coef=1,
        label_loss_coef=4,
        adapter_loss_coef=1,
        lw_saliency=1.0,
        eos_coef=0.1,
        temperature=0.07,
        saliency_margin=0.2,
        adapter_loss=True,
    )
    base.update(over)
    ns = SimpleNamespace(**base)
    ns.device = __import__("torch").device("cpu")
    return ns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="tests/golden/cone_forward.npz")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch

    torch.manual_seed(42)
    np.random.seed(42)

    from cone.model import build_model

    margs = build_args()
    model, criterion = build_model(margs)
    model.eval()
    criterion.eval()

    b, lq, lv = 4, 8, 20
    rng = np.random.default_rng(7)
    src_txt = rng.normal(size=(b, lq, margs.t_feat_dim)).astype(np.float32)
    src_txt_mask = np.ones((b, lq), np.float32)
    src_txt_mask[2, 6:] = 0  # one ragged text
    src_txt_mask[3, 5:] = 0
    src_vid = rng.normal(size=(b, lv, margs.v_motion_feat_dim)).astype(np.float32)
    src_vid_mask = np.ones((b, lv), np.float32)
    src_vid_mask[1, 15:] = 0  # one short window
    src_vid[1, 15:] = 0
    src_txt[2, 6:] = 0
    src_txt[3, 5:] = 0

    with torch.no_grad():
        out = model(
            torch.tensor(src_txt), torch.tensor(src_txt_mask),
            torch.tensor(src_vid), torch.tensor(src_vid_mask),
        )

    # --- clip matching branch ---
    vid_appear = rng.normal(size=(b, lv, margs.v_appear_feat_dim)).astype(np.float32)
    vid_appear_mask = src_vid_mask.copy()
    vid_appear[1, 15:] = 0
    cls_txt = rng.normal(size=(b, margs.t_feat_dim)).astype(np.float32)
    prop_start = np.array([0, 2, 5, 1], np.int64)
    prop_end = np.array([4, 9, 12, 20], np.int64)
    proposals = [
        {"proposal": torch.tensor([[int(s), int(e)]])}
        for s, e in zip(prop_start, prop_end)
    ]
    with torch.no_grad():
        logits_per_video = model.forward_clip_matching(
            torch.tensor(cls_txt), torch.tensor(vid_appear),
            torch.tensor(vid_appear_mask), proposal=proposals, is_groundtruth=True,
        )
        matching_pred = model.forward_clip_matching(
            torch.tensor(cls_txt), torch.tensor(vid_appear),
            torch.tensor(vid_appear_mask), proposal=out["pred_spans"],
            is_groundtruth=False,
        )

    # --- criterion ---
    tgt_spans = np.stack(
        [
            np.array([0.3, 0.2], np.float32),
            np.array([0.55, 0.5], np.float32),
            np.array([0.7, 0.1], np.float32),
            np.array([0.5, 0.9], np.float32),
        ]
    )[:, None, :]  # (B, 1, 2)
    sal_pos = np.array([[3], [2], [10], [7]], np.int64)
    sal_neg = np.array([[15], [0], [1], [19]], np.int64)
    targets = {
        "span_labels": [{"spans": torch.tensor(t)} for t in tgt_spans],
        "saliency_pos_labels": torch.tensor(sal_pos),
        "saliency_neg_labels": torch.tensor(sal_neg),
    }

    neg_vid = rng.normal(size=(b, lv, margs.v_motion_feat_dim)).astype(np.float32)
    with torch.no_grad():
        neg_out = model(
            torch.tensor(src_txt), torch.tensor(src_txt_mask),
            torch.tensor(neg_vid), torch.tensor(np.ones((b, lv), np.float32)),
        )
        loss_dict = criterion(out, targets, neg_out)
        out_for_adapter = dict(out)
        out_for_adapter["logits_per_video"] = logits_per_video
        adapter_loss = criterion.loss_adapter(out_for_adapter)["loss_adapter"]

    blob = {
        "src_txt": src_txt, "src_txt_mask": src_txt_mask,
        "src_vid": src_vid, "src_vid_mask": src_vid_mask,
        "vid_appear": vid_appear, "vid_appear_mask": vid_appear_mask,
        "cls_txt": cls_txt,
        "prop_start": prop_start, "prop_end": prop_end,
        "neg_vid": neg_vid,
        "tgt_spans": tgt_spans.astype(np.float32),
        "sal_pos": sal_pos, "sal_neg": sal_neg,
        "pred_logits": out["pred_logits"].numpy(),
        "pred_spans": out["pred_spans"].numpy(),
        "saliency_scores": out["saliency_scores"].numpy(),
        "logits_per_video": logits_per_video.numpy(),
        "matching_pred": matching_pred.numpy(),
        "neg_pred_logits": neg_out["pred_logits"].numpy(),
        "neg_saliency_scores": neg_out["saliency_scores"].numpy(),
        "adapter_loss": np.float32(adapter_loss.item()),
    }
    for i, aux in enumerate(out["aux_outputs"]):
        blob[f"aux{i}_pred_logits"] = aux["pred_logits"].numpy()
        blob[f"aux{i}_pred_spans"] = aux["pred_spans"].numpy()
    for k, v in loss_dict.items():
        blob[f"loss_{k}"] = np.float32(float(v))
    for name, p in model.state_dict().items():
        blob[f"w::{name}"] = p.numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed(args.out, **blob)
    print(f"wrote {args.out}: {len(blob)} arrays")


if __name__ == "__main__":
    main()
