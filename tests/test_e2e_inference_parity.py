"""FULL-pipeline parity: cone_tpu's entire coarse-to-fine inference (with
converted reference weights) vs the reference model driven through
reference-style inference on the same synthetic corpus (fixture from
tools/gen_golden_e2e.py).

This is the recall-parity proof without real benchmark data: same weights,
same inputs -> same window ranklists -> same final ranked moments in all
three scoring modalities.
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

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "e2e_inference.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no fixture")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN).items())


@pytest.fixture(scope="module")
def results(golden):
    g = golden
    max_v_l, topk_window, dim = g["meta"].tolist()
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=max_v_l),
        data=DataConfig(max_v_l=max_v_l, max_q_l=8, clip_length=1.0,
                        topk_window=topk_window, max_ctx_l=160,
                        normalize_v=False, normalize_t=False),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, max_before_nms=200,
                        query_chunk=3),
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
    params = {"params": torch_state_dict_to_params(sd, cfg.model)}
    model = ConeModel(cfg.model)
    pipe = InferencePipeline(model, params["params"], ds, cfg)
    subs, ranklists = pipe.run(host_postproc=True)
    return subs, ranklists, qids


def test_window_ranklists_match(golden, results):
    _, ranklists, qids = results
    for q in qids:
        assert ranklists[q] == golden[f"{q}_ranklist"].tolist(), q


def test_final_moments_match_all_modalities(golden, results):
    subs, _, qids = results
    for name in ["fusion", "proposal", "matching"]:
        by_qid = {r["query_id"]: r for r in subs[name]}
        for q in qids:
            want = golden[f"{q}_{name}"]  # (n, 5): st, ed, prop, match, score
            got = np.asarray(by_qid[q]["predicted_times"], np.float64)
            assert got.shape == want.shape, (q, name, got.shape, want.shape)
            # spans were rounded to 4dp on both sides before fusion; scores
            # accumulate fp32 differences through the model forward
            np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-3,
                                       err_msg=f"{q} {name} spans")
            np.testing.assert_allclose(got[:, 2:], want[:, 2:], atol=2e-3,
                                       err_msg=f"{q} {name} scores")


def test_fused_path_matches_reference_all_modalities(golden, results):
    """The ONE-dispatch fused path now emits all three scoring modalities
    (cone/inference.py:322-331); each must reproduce the reference's kept
    moments on the converted-weights fixture."""
    g = golden
    max_v_l, topk_window, dim = g["meta"].tolist()
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=max_v_l),
        data=DataConfig(max_v_l=max_v_l, max_q_l=8, clip_length=1.0,
                        topk_window=topk_window, max_ctx_l=160,
                        normalize_v=False, normalize_t=False),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, max_before_nms=200,
                        query_chunk=3),
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
    pipe = InferencePipeline(ConeModel(cfg.model), params, ds, cfg)
    subs, ranklists = pipe.run(host_postproc=False, fused=True)

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
