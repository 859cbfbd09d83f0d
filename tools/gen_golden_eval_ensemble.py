"""Generate goldens for the ensemble recipe and the metric evaluators from
the reference implementation (imported from /root/reference, never copied).

Pins three transcribed-semantics surfaces bit-for-bit:
  * ECCV_2022_workshop/ensemble.py — top1_generator clustering +
    post_processing_mr_nms + the __main__ fusion loop (:115-141);
  * standalone_eval/evaluate_ego4d_nlq.py evaluate_nlq_performance (:65-117);
  * standalone_eval/evaluate_mad.py evaluate_nlq_performance (:60-104).

Writes tests/golden/eval_ensemble_golden.json (inputs + reference outputs);
tests/test_golden_eval_ensemble.py replays cone_tpu against it hermetically.

Usage: python tools/gen_golden_eval_ensemble.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np


def load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def model_preds(seed: int, n_queries: int = 12, rows_per: int = 6):
    """One fake model's challenge-format predictions: rows
    [st, ed, prop, match, fused], fused-desc like inference output."""
    r = np.random.default_rng(seed)
    out = []
    for q in range(n_queries):
        rows = []
        for _ in range(rows_per):
            st = round(float(r.uniform(0, 180)), 4)
            ed = round(st + float(r.uniform(1, 20)), 4)
            rows.append([st, ed, round(float(r.uniform()), 4),
                         round(float(r.uniform()), 4),
                         round(float(r.uniform()), 4)])
        rows.sort(key=lambda x: x[-1], reverse=True)
        out.append({"clip_uid": f"c{q // 4}", "annotation_uid": f"a{q // 2}",
                    "query_idx": q % 2, "predicted_times": rows})
    return out


def gen_ensemble(ens):
    subs = [model_preds(s) for s in (1, 2, 3)]
    max_input, top1_max_input = 4, 1
    fused = []
    # the reference __main__ fusion loop, ensemble.py:115-141, run verbatim
    # through the reference's own functions
    for items in zip(*subs):
        top1_in = []
        for it in items:
            top1_in.extend(it["predicted_times"][:top1_max_input])
        synthesized = ens.top1_generator(top1_in)
        out = dict(items[0])
        rows = []
        for it in items:
            rows.extend(it["predicted_times"][:max_input])
        rows.extend(synthesized)
        out["predicted_times"] = ens.post_processing_mr_nms(rows, idx=4)
        fused.append(out)
    return {"submissions": subs, "max_input": max_input,
            "top1_max_input": top1_max_input, "fused": fused}


def gen_ego4d(ego):
    r = np.random.default_rng(7)
    videos, preds = [], []
    for v in range(2):
        clips = []
        for c in range(2):
            anns = []
            for a in range(2):
                queries = []
                for q in range(2):
                    st = round(float(r.uniform(0, 120)), 3)
                    queries.append({"clip_start_sec": st,
                                    "clip_end_sec": round(st + float(r.uniform(2, 30)), 3)})
                    rows = []
                    for _ in range(7):
                        pst = round(float(r.uniform(0, 120)), 3)
                        rows.append([pst, round(pst + float(r.uniform(1, 40)), 3)])
                    preds.append({"clip_uid": f"v{v}c{c}",
                                  "annotation_uid": f"v{v}c{c}a{a}",
                                  "query_idx": q, "predicted_times": rows})
                anns.append({"annotation_uid": f"v{v}c{c}a{a}",
                             "language_queries": queries})
            clips.append({"clip_uid": f"v{v}c{c}", "annotations": anns})
        videos.append({"clips": clips})
    gt = {"videos": videos}
    thresholds, topk = [0.3, 0.5], [1, 3, 5]
    results, miou = ego.evaluate_nlq_performance(preds, gt, thresholds, topk)
    return {"ground_truth": gt, "predictions": preds,
            "thresholds": thresholds, "topK": topk,
            "results": np.asarray(results).tolist(), "mIoU": float(miou)}


def gen_mad(mad):
    r = np.random.default_rng(11)
    gt, sub = [], []
    for q in range(20):
        st = round(float(r.uniform(0, 500)), 3)
        gt.append({"query_id": f"q{q}",
                   "timestamps": [st, round(st + float(r.uniform(2, 40)), 3)]})
        rows = []
        for _ in range(8):
            pst = round(float(r.uniform(0, 500)), 3)
            rows.append([pst, round(pst + float(r.uniform(1, 60)), 3)])
        sub.append({"query_id": f"q{q}", "predicted_times": rows})
    thresholds, topk = [0.1, 0.3, 0.5], [1, 3, 5]
    recall = mad.evaluate_nlq_performance(sub, gt, thresholds, topk)
    return {"ground_truth": gt, "submission": sub, "thresholds": thresholds,
            "topK": topk, "recall": np.asarray(recall).tolist()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    sys.path.insert(0, args.reference)  # for the scripts' `utils.*` imports
    # terminaltables isn't in this image; only display_results needs it and
    # we never call that — satisfy the module-level import with a stub
    import types

    sys.modules.setdefault("terminaltables", types.SimpleNamespace(
        AsciiTable=None))

    ens = load_module(os.path.join(args.reference,
                                   "ECCV_2022_workshop/ensemble.py"), "ref_ens")
    ego = load_module(os.path.join(args.reference,
                                   "standalone_eval/evaluate_ego4d_nlq.py"),
                      "ref_ego")
    mad = load_module(os.path.join(args.reference,
                                   "standalone_eval/evaluate_mad.py"), "ref_mad")

    golden = {"ensemble": gen_ensemble(ens), "ego4d": gen_ego4d(ego),
              "mad": gen_mad(mad)}
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "eval_ensemble_golden.json")
    with open(out, "w") as f:
        json.dump(golden, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
