"""Submission writers + official nested evaluation round trip."""

import json

import numpy as np

from cone_tpu.data.reformat import ego4d_flat_to_nested
from cone_tpu.eval.metrics import evaluate_ego4d_nlq
from cone_tpu.eval.submission import to_ego4d_challenge, write_submission


def _rows():
    return [
        dict(query_id="anno1_0", query="q", video_id="v", clip_id="c1",
             predicted_times=[[1.0, 2.0, 0.9, 0.8, 1.7], [5.0, 9.0, 0.1, 0.2, 0.3]]),
        dict(query_id="anno1_1", query="q2", video_id="v", clip_id="c1",
             predicted_times=[[10.0, 20.0, 0.5, 0.5, 1.0]]),
    ]


def test_ego4d_challenge_format(tmp_path):
    path = str(tmp_path / "sub.json")
    write_submission(_rows(), path, "ego4d")
    blob = json.load(open(path))
    assert blob["version"] == "1.0"
    assert blob["challenge"] == "ego4d_nlq_challenge"
    r = blob["results"][0]
    assert r["annotation_uid"] == "anno1" and r["query_idx"] == 0
    assert r["clip_uid"] == "c1"
    assert r["predicted_times"] == [[1.0, 2.0], [5.0, 9.0]]


def test_mad_jsonl_format(tmp_path):
    path = str(tmp_path / "sub.jsonl")
    write_submission(_rows(), path, "mad")
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["query_id"] == "anno1_0"
    assert rows[0]["predicted_times"] == [[1.0, 2.0], [5.0, 9.0]]


def test_official_eval_on_written_submission():
    flat_gt = [
        dict(query_id="anno1_0", query="q", video_id="v", clip_id="c1",
             timestamps=[1.0, 2.0]),
        dict(query_id="anno1_1", query="q2", video_id="v", clip_id="c1",
             timestamps=[100.0, 120.0]),
    ]
    nested = ego4d_flat_to_nested(flat_gt)
    # clip_uid in nested GT comes from clip_id
    preds = to_ego4d_challenge(_rows())["results"]
    results, miou = evaluate_ego4d_nlq(preds, nested, [0.3, 0.5], [1, 5])
    # first query exact hit, second query miss -> R@1 = 0.5 at both IoUs
    np.testing.assert_allclose(results, 0.5)
