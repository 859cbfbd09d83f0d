"""Full end-to-end inference parity fixture.

Runs the REFERENCE CONE model through reference-style coarse-to-fine
inference — adapter + frame-similarity window ranking (cone/inference.py:
251-299), per-window Moment-DETR forwards + matching (:40-91, one window
per forward like the training-time eval), reference score_fusion +
post_processing_mr_nms (:103-217) — on deterministic synthetic data, and
records the final submissions for all three modalities. The parity test
then drives cone_tpu's ENTIRE pipeline with converted weights over the same
data and compares the final ranked moments.

Usage: python tools/gen_golden_e2e.py
"""

from __future__ import annotations

import math
import sys
import types
from types import SimpleNamespace

import numpy as np


def generate(out_path: str, max_v_l: int = 32, topk_window: int = 4,
             clip_len: float = 1.0, dim: int = 36, n_videos: int = 2,
             queries_per_video: int = 3, ctx_range=(100, 150),
             data_seed: int = 77):
    # shims for reference imports (lmdb/terminaltables not installed)
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

    stride = max_v_l // 2
    margs = build_args(
        t_feat_dim=dim, v_motion_feat_dim=dim, v_appear_feat_dim=dim,
        max_v_l=max_v_l, max_q_l=8,
    )
    model, _ = build_model(margs)
    model.eval()

    # deterministic synthetic corpus
    rng = np.random.default_rng(data_seed)
    videos = {}
    queries = []  # (qid, clip_id, tokens, cls)
    for v in range(n_videos):
        ctx_l = int(rng.integers(*ctx_range))
        feats = rng.normal(size=(ctx_l, dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-5
        videos[f"v{v}"] = feats
        for q in range(queries_per_video):
            tok = rng.normal(size=(int(rng.integers(3, 8)), dim)).astype(np.float32)
            tok /= np.linalg.norm(tok, axis=-1, keepdims=True) + 1e-5
            cls = rng.normal(size=(dim,)).astype(np.float32)
            cls /= np.linalg.norm(cls) + 1e-5
            queries.append((f"v{v}_q{q}", f"v{v}", tok, cls))

    opt = SimpleNamespace(nms_thd=0.5, max_before_nms=200, max_after_nms=5,
                          eval_split_name="val")

    blob = {}
    with torch.no_grad():
        # coarse: adapter + renormalize per video (inference.py:251-260)
        adapted = {}
        for vid, feats in videos.items():
            t = torch.tensor(feats)
            a = model.adapter_layer(t) + t
            a = a / a.norm(dim=1, keepdim=True)
            adapted[vid] = a

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
            # The reference sorts with unstable torch.sort (inference.py:298).
            # Adjacent overlapping windows tie EXACTLY whenever the max frame
            # lies in their overlap half, and unstable-sort tie order is
            # implementation noise (empirically chaotic across sizes/data:
            # introsort partitioning). Pin the defined policy both sides use:
            # stable descending (earlier window first on ties).
            _, order = torch.sort(torch.stack(w_scores), descending=True,
                                  stable=True)
            ranklist = order.tolist()
            blob[f"{qid}_ranklist"] = np.asarray(ranklist, np.int64)

            # fine: one window per forward (reference eval math, unpadded)
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

            ret = score_fusion(cands)
            for name, idx in [("proposal", 0), ("matching", 1), ("fusion", 2)]:
                out_rows = post_processing_mr_nms(opt, ret, idx)
                blob[f"{qid}_{name}"] = np.asarray(out_rows, np.float64)

    for vid, feats in videos.items():
        blob[f"video_{vid}"] = feats
    for qid, vid, tok, cls in queries:
        blob[f"tok_{qid}"] = tok
        blob[f"cls_{qid}"] = cls
    for name, p in model.state_dict().items():
        blob[f"w::{name}"] = p.numpy()
    blob["meta"] = np.asarray([max_v_l, topk_window, dim], np.int64)
    blob["clip_len"] = np.asarray(clip_len, np.float64)

    np.savez_compressed(out_path, **blob)
    print(f"wrote {out_path}: {len(blob)} arrays")


def main():
    # tiny full config: window 32, top-4 windows, 6 queries
    generate("tests/golden/e2e_inference.npz")
    # MAD-proportioned: longer videos (ctx buckets bind in the parity
    # test), stride-fraction clip length, a deeper window budget -> a
    # 40-candidate fusion/dedup/NMS set per query
    generate("tests/golden/e2e_inference_mad.npz", max_v_l=40,
             topk_window=8, clip_len=0.2, dim=48, n_videos=2,
             queries_per_video=3, ctx_range=(300, 480), data_seed=31)


if __name__ == "__main__":
    main()
