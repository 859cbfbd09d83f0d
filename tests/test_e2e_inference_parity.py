"""FULL-pipeline parity: cone_tpu's entire coarse-to-fine inference (with
converted reference weights) vs the reference model driven through
reference-style inference on the same synthetic corpus (fixtures from
tools/gen_golden_e2e.py).

This is the recall-parity proof without real benchmark data: same weights,
same inputs -> same window ranklists -> same final ranked moments in all
three scoring modalities. Two geometries:

- base: window 32, top-4 windows, clip_len 1.0, ctx ~100-150 (ego4d-ish)
- mad:  window 40, top-8 windows, clip_len 0.2, ctx 398/448 -> the two
  videos land in DIFFERENT ctx buckets (416 vs 512), so bucketed shape
  compilation, sub-second clip decode, and a 40-candidate fusion/dedup/NMS
  set per query are all on the parity path.
"""

import os
import sys

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data.dataset import GroundingDataset, QueryExample
from cone_tpu.data.store import InMemoryArrayStore, TextFeatureStore
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.cone import ConeModel

_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = {
    "base": dict(fname="e2e_inference.npz", max_ctx_l=160, ctx_buckets=()),
    "mad": dict(fname="e2e_inference_mad.npz", max_ctx_l=512,
                ctx_buckets=(416, 512)),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    spec = CASES[request.param]
    path = os.path.join(_DIR, spec["fname"])
    if not os.path.exists(path):
        pytest.skip(f"no fixture {spec['fname']}")
    return dict(np.load(path).items()), spec


def _build(case):
    """Config + dataset + converted params + qids from a fixture blob."""
    g, spec = case
    max_v_l, topk_window, dim = g["meta"].tolist()
    clip_len = float(g.get("clip_len", 1.0))
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=max_v_l),
        data=DataConfig(max_v_l=max_v_l, max_q_l=8, clip_length=clip_len,
                        topk_window=topk_window, max_ctx_l=spec["max_ctx_l"],
                        normalize_v=False, normalize_t=False),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, max_before_nms=200,
                        query_chunk=3, ctx_buckets=spec["ctx_buckets"]),
    )

    vids = {k[6:]: g[k] for k in g if k.startswith("video_")}
    qids = sorted(k[4:] for k in g if k.startswith("tok_"))
    toks = {q: g[f"tok_{q}"] for q in qids}
    clss = {q: g[f"cls_{q}"][None] for q in qids}
    examples = [
        QueryExample(query_id=q, query="", video_id=q.split("_")[0],
                     clip_id=q.split("_")[0], timestamps=[0, 0], duration=0.0)
        for q in qids
    ]
    ds = GroundingDataset(
        examples, InMemoryArrayStore(vids),
        TextFeatureStore(InMemoryArrayStore(toks), InMemoryArrayStore(clss)),
        cfg.data,
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_ckpt import torch_state_dict_to_params

    sd = {k[3:]: v for k, v in g.items() if k.startswith("w::")}
    params = torch_state_dict_to_params(sd, cfg.model)
    return cfg, ds, params, qids


@pytest.fixture(scope="module")
def results(case):
    cfg, ds, params, qids = _build(case)
    pipe = InferencePipeline(ConeModel(cfg.model), params, ds, cfg)
    subs, ranklists = pipe.run(host_postproc=True)
    return subs, ranklists, qids


def test_window_ranklists_match(case, results):
    g, _ = case
    _, ranklists, qids = results
    for q in qids:
        assert ranklists[q] == g[f"{q}_ranklist"].tolist(), q


def test_final_moments_match_all_modalities(case, results):
    g, _ = case
    subs, _, qids = results
    for name in ["fusion", "proposal", "matching"]:
        by_qid = {r["query_id"]: r for r in subs[name]}
        for q in qids:
            want = g[f"{q}_{name}"]  # (n, 5): st, ed, prop, match, score
            got = np.asarray(by_qid[q]["predicted_times"], np.float64)
            assert got.shape == want.shape, (q, name, got.shape, want.shape)
            # spans were rounded to 4dp on both sides before fusion; scores
            # accumulate fp32 differences through the model forward
            np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-3,
                                       err_msg=f"{q} {name} spans")
            np.testing.assert_allclose(got[:, 2:], want[:, 2:], atol=2e-3,
                                       err_msg=f"{q} {name} scores")


def test_fused_path_matches_reference_all_modalities(case):
    """The ONE-dispatch fused path emits all three scoring modalities
    (cone/inference.py:322-331); each must reproduce the reference's kept
    moments on the converted-weights fixtures."""
    g, _ = case
    cfg, ds, params, qids = _build(case)
    pipe = InferencePipeline(ConeModel(cfg.model), params, ds, cfg)
    subs, ranklists = pipe.run(host_postproc=False, fused=True)

    for q in qids:
        assert ranklists[q] == g[f"{q}_ranklist"].tolist(), q

    score_col = {"fusion": 4, "proposal": 2, "matching": 3}
    for name in ["fusion", "proposal", "matching"]:
        by_qid = {r["query_id"]: r for r in subs[name]}
        for q in qids:
            want = g[f"{q}_{name}"]  # (n, 5): st, ed, prop, match, fused
            got = np.asarray(by_qid[q]["predicted_times"], np.float64)
            assert got.shape[0] == want.shape[0], (q, name, got.shape, want.shape)
            np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-3,
                                       err_msg=f"{q} {name} spans (fused)")
            np.testing.assert_allclose(
                got[:, 2], want[:, score_col[name]], atol=2e-3,
                err_msg=f"{q} {name} scores (fused)")
