"""Reference-generated goldens for the ensemble recipe + metric evaluators.

Fixture from tools/gen_golden_eval_ensemble.py (runs the reference's own
ensemble functions and standalone evaluators on seeded random inputs).
These are the last transcribed-semantics surfaces that were verified by
reading, not by fixture: ECCV ensemble.py, evaluate_ego4d_nlq.py,
evaluate_mad.py.
"""

import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "eval_ensemble_golden.json")


def _load():
    with open(GOLDEN) as f:
        return json.load(f)


def test_ensemble_matches_reference():
    g = _load()["ensemble"]
    from cone_tpu.eval.ensemble import ensemble_predictions

    out = ensemble_predictions(g["submissions"], max_input=g["max_input"],
                               top1_max_input=g["top1_max_input"])
    assert len(out) == len(g["fused"])
    for got, exp in zip(out, g["fused"]):
        np.testing.assert_allclose(got["predicted_times"],
                                   exp["predicted_times"], rtol=0, atol=1e-9)


def test_ego4d_evaluator_matches_reference():
    g = _load()["ego4d"]
    from cone_tpu.eval.metrics import evaluate_ego4d_nlq

    results, miou = evaluate_ego4d_nlq(g["predictions"], g["ground_truth"],
                                       g["thresholds"], g["topK"])
    np.testing.assert_allclose(results, np.asarray(g["results"]),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(miou, g["mIoU"], rtol=0, atol=1e-12)


def test_mad_evaluator_matches_reference():
    g = _load()["mad"]
    from cone_tpu.eval.metrics import evaluate_recall_table

    recall = evaluate_recall_table(g["submission"], g["ground_truth"],
                                   g["thresholds"], g["topK"])
    # the reference accumulates in float32 torch; ours float64 numpy
    np.testing.assert_allclose(recall, np.asarray(g["recall"]),
                               rtol=0, atol=1e-6)
