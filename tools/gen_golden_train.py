"""Generate the TRAINING-DYNAMICS parity fixture from the reference.

Runs the reference's actual training step (cone/train.py:53-89: pos forward,
neg forward, criterion, GT-proposal adapter forward, weighted sum, backward,
clip_grad_norm_(0.1), grouped-AdamW update per cone/inference.py:511-523)
for N steps on a fixed tiny batch with dropout disabled, and records the
per-step total loss, per-step criterion terms, per-step pre-clip gradient
norm, the initial weights, and the final weights.

tests/test_train_parity.py replays the same N steps through cone_tpu's
make_train_step + make_optimizer from the converted initial weights and pins
the whole trajectory — gradients, global-norm clipping, the two AdamW lr
groups and decoupled weight decay all have to agree for the losses AND the
final parameters to match.

Usage: python tools/gen_golden_train.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

N_STEPS = 4
LR, COEF_LR, WD, GRAD_CLIP = 1e-4, 0.1, 1e-4, 0.1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="tests/golden/train_trajectory.npz")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import torch
    import torch.nn as nn

    from gen_golden import build_args

    torch.manual_seed(42)
    np.random.seed(42)

    from cone.model import build_model

    # dropout must be OFF on both sides for a deterministic trajectory
    margs = build_args(dropout=0.0, input_dropout=0.0)
    model, criterion = build_model(margs)
    model.train()
    criterion.train()
    weight_dict = criterion.weight_dict

    b, lq, lv = 4, 8, 20
    rng = np.random.default_rng(11)
    src_txt = rng.normal(size=(b, lq, margs.t_feat_dim)).astype(np.float32)
    src_txt_mask = np.ones((b, lq), np.float32)
    src_txt_mask[2, 6:] = 0
    src_txt[2, 6:] = 0
    src_vid = rng.normal(size=(b, lv, margs.v_motion_feat_dim)).astype(np.float32)
    src_vid_mask = np.ones((b, lv), np.float32)
    src_vid_mask[1, 15:] = 0
    src_vid[1, 15:] = 0
    neg_vid = rng.normal(size=(b, lv, margs.v_motion_feat_dim)).astype(np.float32)
    neg_mask = np.ones((b, lv), np.float32)
    vid_appear = rng.normal(size=(b, lv, margs.v_appear_feat_dim)).astype(np.float32)
    vid_appear_mask = src_vid_mask.copy()
    vid_appear[1, 15:] = 0
    cls_txt = rng.normal(size=(b, margs.t_feat_dim)).astype(np.float32)
    prop_start = np.array([0, 2, 5, 1], np.int64)
    prop_end = np.array([4, 9, 12, 20], np.int64)
    tgt_spans = np.stack(
        [
            np.array([0.3, 0.2], np.float32),
            np.array([0.55, 0.5], np.float32),
            np.array([0.7, 0.1], np.float32),
            np.array([0.5, 0.9], np.float32),
        ]
    )[:, None, :]
    sal_pos = np.array([[3], [2], [10], [7]], np.int64)
    sal_neg = np.array([[15], [0], [1], [19]], np.int64)

    targets = {
        "span_labels": [{"spans": torch.tensor(t)} for t in tgt_spans],
        "saliency_pos_labels": torch.tensor(sal_pos),
        "saliency_neg_labels": torch.tensor(sal_neg),
    }
    proposals = [
        {"proposal": torch.tensor([[int(s), int(e)]])}
        for s, e in zip(prop_start, prop_end)
    ]

    blob = {
        "src_txt": src_txt, "src_txt_mask": src_txt_mask,
        "src_vid": src_vid, "src_vid_mask": src_vid_mask,
        "neg_vid": neg_vid, "neg_mask": neg_mask,
        "vid_appear": vid_appear, "vid_appear_mask": vid_appear_mask,
        "cls_txt": cls_txt,
        "prop_start": prop_start, "prop_end": prop_end,
        "tgt_spans": tgt_spans.astype(np.float32),
        "sal_pos": sal_pos, "sal_neg": sal_neg,
        "n_steps": np.int64(N_STEPS),
        "lr": np.float64(LR), "coef_lr": np.float64(COEF_LR),
        "wd": np.float64(WD), "grad_clip": np.float64(GRAD_CLIP),
    }
    for name, p in model.state_dict().items():
        blob[f"w0::{name}"] = p.detach().numpy().copy()

    # grouped AdamW exactly as the reference builds it
    # (cone/inference.py:511-523): adapter_layer.* at lr * coef_lr,
    # everything else at lr; decoupled weight decay on every param.
    adapter_ps = [p for n, p in model.named_parameters()
                  if n.startswith("adapter_layer.")]
    detr_ps = [p for n, p in model.named_parameters()
               if not n.startswith("adapter_layer.")]
    optimizer = torch.optim.AdamW(
        [{"params": adapter_ps, "lr": LR * COEF_LR},
         {"params": detr_ps, "lr": LR}],
        lr=LR, weight_decay=WD)

    t_src_txt = torch.tensor(src_txt)
    t_src_txt_mask = torch.tensor(src_txt_mask)
    t_src_vid = torch.tensor(src_vid)
    t_src_vid_mask = torch.tensor(src_vid_mask)
    t_neg_vid = torch.tensor(neg_vid)
    t_neg_mask = torch.tensor(neg_mask)
    t_cls = torch.tensor(cls_txt)
    t_appear = torch.tensor(vid_appear)
    t_appear_mask = torch.tensor(vid_appear_mask)

    for step in range(N_STEPS):
        pos_out = model(t_src_txt, t_src_txt_mask, t_src_vid, t_src_vid_mask)
        neg_out = model(t_src_txt, t_src_txt_mask, t_neg_vid, t_neg_mask)
        loss_dict = criterion(pos_out, targets, neg_out)
        losses = sum(loss_dict[k] * weight_dict[k]
                     for k in loss_dict if k in weight_dict)
        pos_out["logits_per_video"] = model.forward_clip_matching(
            t_cls, t_appear, t_appear_mask, proposal=proposals,
            is_groundtruth=True)
        adapter_loss = criterion.loss_adapter(pos_out)["loss_adapter"]
        losses = losses + adapter_loss * weight_dict["loss_adapter"]

        optimizer.zero_grad()
        losses.backward()
        total_norm = nn.utils.clip_grad_norm_(model.parameters(), GRAD_CLIP)
        optimizer.step()

        blob[f"step{step}_loss_overall"] = np.float64(losses.item())
        blob[f"step{step}_grad_norm"] = np.float64(float(total_norm))
        blob[f"step{step}_loss_adapter"] = np.float64(adapter_loss.item())
        for k, v in loss_dict.items():
            blob[f"step{step}_{k}"] = np.float64(float(v))
        print(f"step {step}: loss={losses.item():.6f} "
              f"grad_norm={float(total_norm):.4f}")

    for name, p in model.state_dict().items():
        blob[f"w::{name}"] = p.detach().numpy().copy()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **blob)
    print(f"wrote {args.out}: {len(blob)} arrays")


if __name__ == "__main__":
    main()
