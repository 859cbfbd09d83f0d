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


if __name__ == "__main__":
    main()
