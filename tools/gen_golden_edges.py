"""Ragged-edge golden fixtures from the reference pipeline (VERDICT r1 #8).

Covers the geometry edge cases the reference handles implicitly with
unpadded variable-length batches (cone/ego4d_mad_dataloader.py:148-151):

  * v_tiny  — video shorter than the window stride (windows 0 and 1 are the
              SAME slice -> duplicate candidates exercise the dict dedup,
              inference.py:214-216)
  * v_short — video shorter than one window
  * v_exact — ctx_l exactly k * stride
  * v_win   — ctx_l exactly max_v_l
  * plus an nms_thd=-1 variant of every submission (inference.py:110-127)

Same recipe as tools/gen_golden_e2e.py (reference imported, never copied).
Usage: python tools/gen_golden_edges.py
"""

from __future__ import annotations

import math
import sys
import types
from types import SimpleNamespace

import numpy as np


def main():
    sys.modules.setdefault("lmdb", types.ModuleType("lmdb"))
    tt = types.ModuleType("terminaltables")

    class _T:
        def __init__(self, *a, **k):
            self.justify_columns = {}
            self.table = ""

    tt.AsciiTable = _T
    sys.modules.setdefault("terminaltables", tt)

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "tools")
    import torch

    torch.manual_seed(123)
    np.random.seed(123)

    from gen_golden import build_args

    from cone.inference import post_processing_mr_nms, score_fusion
    from cone.model import build_model
    from cone.span_utils import span_cxw_to_xx

    max_v_l, topk_window, clip_len = 32, 4, 1.0
    stride = max_v_l // 2
    dim = 36
    margs = build_args(
        t_feat_dim=dim, v_motion_feat_dim=dim, v_appear_feat_dim=dim,
        max_v_l=max_v_l, max_q_l=8,
    )
    model, _ = build_model(margs)
    model.eval()

    rng = np.random.default_rng(31)

    def mk_feats(ctx_l):
        f = rng.normal(size=(ctx_l, dim)).astype(np.float32)
        return f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-5)

    videos = {
        "vtiny": mk_feats(10),    # < stride: windows 0 and 1 identical
        "vshort": mk_feats(20),   # < max_v_l
        "vexact": mk_feats(96),   # exactly 6 * stride
        "vwin": mk_feats(32),     # exactly max_v_l
    }
    queries = []
    for vid in videos:
        for q in range(2):
            tok = mk_feats(int(rng.integers(3, 8)))
            cls = mk_feats(1)[0]
            queries.append((f"{vid}_q{q}", vid, tok, cls))

    blob = {}
    with torch.no_grad():
        adapted = {}
        for vid, feats in videos.items():
            t = torch.tensor(feats)
            a = model.adapter_layer(t) + t
            adapted[vid] = a / a.norm(dim=1, keepdim=True)

        for qid, vid, tok, cls in queries:
            feats = adapted[vid]
            ctx_l = feats.shape[0]
            frame_scores = torch.einsum("db,b->d", feats, torch.tensor(cls))
            n_win = math.ceil(ctx_l / stride) + 1
            w_scores = []
            for i in range(n_win):
                s = max((i - 1) * stride, 0)
                e = min((i - 1) * stride + max_v_l, ctx_l)
                w_scores.append(torch.max(frame_scores[s:e]))
            _, order = torch.sort(torch.stack(w_scores), descending=True)
            ranklist = order.tolist()
            blob[f"{qid}_ranklist"] = np.asarray(ranklist, np.int64)
            blob[f"{qid}_wscores"] = torch.stack(w_scores).numpy().astype(np.float64)

            raw = videos[vid]
            cands = []
            for w in ranklist[:topk_window]:
                s = max((w - 1) * stride, 0)
                e = min((w - 1) * stride + max_v_l, ctx_l)
                vfeat = torch.tensor(raw[s:e])[None]
                vmask = torch.ones(1, e - s)
                tfeat = torch.tensor(tok)[None]
                tmask = torch.ones(1, len(tok))
                out = model(tfeat, tmask, vfeat, vmask)
                prob = torch.softmax(out["pred_logits"], -1)[0, :, 0]
                matching = model.forward_clip_matching(
                    torch.tensor(cls)[None], vfeat, vmask,
                    proposal=out["pred_spans"], is_groundtruth=False,
                )[0]
                spans = (span_cxw_to_xx(out["pred_spans"][0]) * (e - s) + s) * clip_len
                rows = [
                    [float(spans[j, 0]), float(spans[j, 1]), float(prob[j]),
                     float(matching[j])]
                    for j in range(spans.shape[0])
                ]
                rows = sorted(rows, key=lambda x: x[2], reverse=True)
                rows = [[float(f"{x:.4f}") for x in r] for r in rows]
                cands.extend(rows)

            blob[f"{qid}_n_before_dedup"] = np.int64(len(cands))
            ret = score_fusion(cands)
            blob[f"{qid}_n_after_dedup"] = np.int64(len(ret))
            for thd, tag in [(0.5, ""), (-1, "_nonms")]:
                opt = SimpleNamespace(nms_thd=thd, max_before_nms=200,
                                      max_after_nms=5, eval_split_name="val")
                for name, idx in [("proposal", 0), ("matching", 1),
                                  ("fusion", 2)]:
                    out_rows = post_processing_mr_nms(opt, ret, idx)
                    blob[f"{qid}_{name}{tag}"] = np.asarray(out_rows, np.float64)

    for vid, feats in videos.items():
        blob[f"video_{vid}"] = feats
    for qid, vid, tok, cls in queries:
        blob[f"tok_{qid}"] = tok
        blob[f"cls_{qid}"] = cls
    for name, p in model.state_dict().items():
        blob[f"w::{name}"] = p.numpy()
    blob["meta"] = np.asarray([max_v_l, topk_window, dim], np.int64)

    np.savez_compressed("tests/golden/edge_inference.npz", **blob)
    print(f"wrote tests/golden/edge_inference.npz: {len(blob)} arrays")
    # report dedup coverage so the fixture provably exercises it
    for qid, vid, _, _ in queries:
        nb, na = blob[f"{qid}_n_before_dedup"], blob[f"{qid}_n_after_dedup"]
        if nb != na:
            print(f"  {qid}: dedup {nb} -> {na}")


if __name__ == "__main__":
    main()
