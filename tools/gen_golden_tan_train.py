"""Generate the TAN-family TRAINING-DYNAMICS parity fixture.

Runs the reference 2D-TAN training recipe for N steps on a fixed tiny batch:
the network closure's loss assembly (pos bce_rescale + neg-window bce toward
zeros + 0.1 x adapter NCE, cone_2dtan/moment_localization/train.py:256-288),
the engine's hardcoded clip_grad_norm_(parameters, 10) between backward and
step (train.py:457-458, lib/core/engine.py:43-56), and
Adam(lr, betas=(0.9, 0.999), weight_decay) (train.py:143-145). weight_decay
is set NONZERO here (the shipped yamls use 0) so the fixture pins torch
Adam's L2-via-gradient semantics, not just the zero path.

Model construction mirrors tools/gen_golden_tan.py: the reference submodules
assembled exactly like CONE_TAN.forward / forward_clip_matching
(lib/models/cone_tan.py:26-87) to avoid its global-config machinery. TAN has
no dropout or batchnorm, so the trajectory is deterministic.

tests/test_tan_train_parity.py replays the steps through make_tan_train_step
+ make_tan_optimizer and pins per-step losses, pre-clip grad norms, and the
final weights — gradient parity through the LSTM fusion, map convs, masked
BCE, proposal pooling and adapter included.

Usage: python tools/gen_golden_tan_train.py
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace as NS

import numpy as np

N_STEPS = 4
LR, WD, GRAD_CLIP, ADAPTER_W, TEMP = 1e-4, 1e-4, 10.0, 0.1, 0.07


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
    import torch.nn as nn

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU golden run
    torch.manual_seed(0)
    np.random.seed(0)

    from models.adapter_modules.adapter import VisualAdapter
    from models.frame_modules.frame_pool import FrameAvgPool
    from models.fusion_modules.base_fusion import BaseFusion
    from models.loss import adapter_loss, bce_rescale_loss
    from models.map_modules.map_conv import MapConv
    from models.prop_modules.sparse import SparsePropMaxPool

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
    mods = {"frame": frame, "fusion": fusion, "mapconv": mapconv,
            "pred": pred, "adapter": adapter}
    for m in mods.values():
        m.train()

    b, lq = 3, 10
    rng = np.random.default_rng(1)
    vis = rng.normal(size=(b, NC, H)).astype(np.float32)
    neg_vis = rng.normal(size=(b, NC, H)).astype(np.float32)
    tok = rng.normal(size=(b, lq, D_T)).astype(np.float32)
    tok_mask = np.ones((b, lq), np.float32)
    tok_mask[1, 7:] = 0
    tok_mask[2, 4:] = 0
    tok[1, 7:] = 0
    tok[2, 4:] = 0
    vid_appear = rng.normal(size=(b, NC, H)).astype(np.float32)
    cls_txt = rng.normal(size=(b, H)).astype(np.float32)
    prop_start = np.array([2, 10, 0], np.int64)
    prop_end = np.array([18, 40, 6], np.int64)

    gt = [(3.2, 17.9), (40.0, 63.5), (0.0, 5.0)]

    # IoU targets via the reference's hull-union formula, like
    # tools/gen_golden_tan.py (lib/core/eval.py:9-27)
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

    blob = {
        "vis": vis, "neg_vis": neg_vis, "tok": tok, "tok_mask": tok_mask,
        "vid_appear": vid_appear, "cls_txt": cls_txt,
        "prop_start": prop_start, "prop_end": prop_end,
        "gt_spans": np.asarray(gt, np.float64), "targets": targets,
        "n_steps": np.int64(N_STEPS),
        "lr": np.float64(LR), "wd": np.float64(WD),
        "grad_clip": np.float64(GRAD_CLIP),
        "adapter_w": np.float64(ADAPTER_W), "temperature": np.float64(TEMP),
    }
    for name, m in mods.items():
        for pname, p in m.state_dict().items():
            blob[f"w0::{name}.{pname}"] = p.detach().numpy().copy()

    params = [p for m in mods.values() for p in m.parameters()]
    optimizer = torch.optim.Adam(params, lr=LR, betas=(0.9, 0.999),
                                 weight_decay=WD)
    loss_cfg = NS(MIN_IOU=0.3, MAX_IOU=0.7, BIAS=0.5)
    adapter_cfg = NS(ADAPER_TEMPERATURE=TEMP)

    t_vis = torch.tensor(vis)
    t_neg = torch.tensor(neg_vis)
    t_tok = torch.tensor(tok)
    t_tok_mask = torch.tensor(tok_mask)
    t_targets = torch.tensor(targets)[:, None]
    t_appear = torch.tensor(vid_appear)
    t_cls = torch.tensor(cls_txt)

    def forward_map(visual):
        vis_h = frame(visual.transpose(1, 2))
        map_h, map_mask = prop(vis_h)
        fused = fusion(t_tok, t_tok_mask[..., None], map_h, map_mask)
        conved = mapconv(fused, map_mask)
        return pred(conved) * map_mask, map_mask

    def forward_clip_matching_gt():
        # cone_tan.py:52-87 with is_groundtruth=True
        text_cls = t_cls / t_cls.norm(dim=1, keepdim=True)
        feats = []
        for i in range(b):
            feats.append(t_appear[i, prop_start[i]:prop_end[i]].mean(axis=0))
        proposal_feat = torch.vstack(feats)
        proposal_feat = adapter(proposal_feat) + proposal_feat
        proposal_feat = proposal_feat / proposal_feat.norm(dim=1, keepdim=True)
        return torch.einsum("bd,ad->ba", proposal_feat, text_cls)

    for step in range(N_STEPS):
        scores, map_mask = forward_map(t_vis)
        loss_value, _ = bce_rescale_loss(scores, map_mask, t_targets, loss_cfg)
        neg_scores, neg_mask = forward_map(t_neg)
        neg_loss, _ = bce_rescale_loss(
            neg_scores, neg_mask, torch.zeros_like(neg_scores), loss_cfg)
        a_loss = adapter_loss(forward_clip_matching_gt(), adapter_cfg)
        total = loss_value + neg_loss + ADAPTER_W * a_loss

        optimizer.zero_grad()
        total.backward()
        total_norm = nn.utils.clip_grad_norm_(params, GRAD_CLIP)
        optimizer.step()

        blob[f"step{step}_loss_overall"] = np.float64(total.item())
        blob[f"step{step}_loss_bce"] = np.float64(loss_value.item())
        blob[f"step{step}_loss_neg_bce"] = np.float64(neg_loss.item())
        blob[f"step{step}_loss_adapter"] = np.float64(a_loss.item())
        blob[f"step{step}_grad_norm"] = np.float64(float(total_norm))
        print(f"step {step}: loss={total.item():.6f} "
              f"grad_norm={float(total_norm):.4f}")

    for name, m in mods.items():
        for pname, p in m.state_dict().items():
            blob[f"w::{name}.{pname}"] = p.detach().numpy().copy()

    os.makedirs("tests/golden", exist_ok=True)
    out = "tests/golden/tan_train_trajectory.npz"
    np.savez_compressed(out, **blob)
    print(f"wrote {out}: {len(blob)} arrays")


if __name__ == "__main__":
    main()
