"""Golden fixture for submission post-processing: run the REFERENCE's
score_fusion + post_processing_mr_nms (cone/inference.py:103-217) on random
candidate grids and record the outputs for all three modalities.

cone/inference.py transitively imports lmdb and terminaltables (not
installed) — shimmed, they're unused by these functions.

Usage: python tools/gen_golden_postproc.py
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np


def _shim(name):
    sys.modules.setdefault(name, types.ModuleType(name))


def main():
    _shim("lmdb")
    tt = types.ModuleType("terminaltables")

    class _T:
        def __init__(self, *a, **k):
            self.justify_columns = {}
            self.table = ""

    tt.AsciiTable = _T
    sys.modules.setdefault("terminaltables", tt)

    sys.path.insert(0, "/root/reference")
    from cone.inference import post_processing_mr_nms, score_fusion

    rng = np.random.default_rng(17)
    n_queries, k, nq = 6, 5, 5
    fixtures = []
    for q in range(n_queries):
        # raw per-window grids like the fine stage produces
        centers = rng.uniform(10, 500, size=(k, nq))
        widths = rng.uniform(1, 40, size=(k, nq))
        spans = np.stack([centers - widths / 2, centers + widths / 2], -1)
        prob = rng.uniform(0, 1, size=(k, nq))
        match = rng.uniform(-1, 1, size=(k, nq))
        # duplicate one span across windows to exercise the dict dedup
        spans[1, 0] = spans[0, 0]
        fixtures.append((spans.astype(np.float32), prob.astype(np.float32),
                         match.astype(np.float32)))

    opt = SimpleNamespace(nms_thd=0.5, max_before_nms=200, max_after_nms=5,
                          eval_split_name="val")

    blob = {}
    for qi, (spans, prob, match) in enumerate(fixtures):
        # the reference's candidate-list construction
        # (cone/inference.py:70-91): per window sort by prob desc, round 4dp
        cands = []
        for w in range(k):
            rows = [
                [float(spans[w, j, 0]), float(spans[w, j, 1]),
                 float(prob[w, j]), float(match[w, j])]
                for j in range(nq)
            ]
            rows = sorted(rows, key=lambda x: x[2], reverse=True)
            rows = [[float(f"{v:.4f}") for v in r] for r in rows]
            cands.extend(rows)

        ret = score_fusion(cands)
        for name, idx in [("proposal", 0), ("matching", 1), ("fusion", 2)]:
            out = post_processing_mr_nms(opt, ret, idx)
            blob[f"q{qi}_{name}"] = np.asarray(out, np.float64)
        blob[f"q{qi}_spans"] = spans
        blob[f"q{qi}_prob"] = prob
        blob[f"q{qi}_match"] = match

    blob["n_queries"] = np.int64(n_queries)
    np.savez_compressed("tests/golden/postproc.npz", **blob)
    print(f"wrote tests/golden/postproc.npz: {len(blob)} arrays")

    # ---- MAD geometry: 30 windows x 10 proposals = 300 candidates, the
    # regime where max_before_nms=200 BINDS (truncation changes the NMS
    # input set; cone/inference.py:108-112), plus the nms_thd=-1 path
    # (before_nms_output[:max_after_nms], :126-127). Includes exact score
    # ties and duplicate spans at the truncation boundary.
    rng = np.random.default_rng(23)
    k, nq, n_mad = 30, 10, 4
    blob2 = {}
    for qi in range(n_mad):
        centers = rng.uniform(10, 7000, size=(k, nq))
        widths = rng.uniform(1, 60, size=(k, nq))
        spans = np.stack([centers - widths / 2, centers + widths / 2], -1)
        prob = rng.uniform(0, 1, size=(k, nq))
        match = rng.uniform(-1, 1, size=(k, nq))
        # exact prob ties across windows + duplicate spans (dict dedup:
        # LAST occurrence's scores win in the reference's cand dict build)
        prob[3, :] = prob[2, :]
        spans[5, 1] = spans[4, 1]
        spans[29, 9] = spans[0, 0]
        cands = []
        for w in range(k):
            rows = [
                [float(spans[w, j, 0]), float(spans[w, j, 1]),
                 float(prob[w, j]), float(match[w, j])]
                for j in range(nq)
            ]
            rows = sorted(rows, key=lambda x: x[2], reverse=True)
            rows = [[float(f"{v:.4f}") for v in r] for r in rows]
            cands.extend(rows)
        ret = score_fusion(cands)
        for thd, tag in [(0.5, "nms"), (-1, "raw")]:
            opt2 = SimpleNamespace(nms_thd=thd, max_before_nms=200,
                                   max_after_nms=5, eval_split_name="val")
            for name, idx in [("proposal", 0), ("matching", 1),
                              ("fusion", 2)]:
                out = post_processing_mr_nms(opt2, ret, idx)
                blob2[f"q{qi}_{tag}_{name}"] = np.asarray(out, np.float64)
        blob2[f"q{qi}_spans"] = spans
        blob2[f"q{qi}_prob"] = prob
        blob2[f"q{qi}_match"] = match
    blob2["n_queries"] = np.int64(n_mad)
    np.savez_compressed("tests/golden/postproc_mad.npz", **blob2)
    print(f"wrote tests/golden/postproc_mad.npz: {len(blob2)} arrays")


if __name__ == "__main__":
    main()
