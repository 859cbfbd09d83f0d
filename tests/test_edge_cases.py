"""Edge cases: videos shorter than one window, single-token queries,
topk_window exceeding the window count."""

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data.dataset import GroundingDataset, QueryExample, TrainLoader
from cone_tpu.data.store import InMemoryArrayStore, TextFeatureStore
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params
from cone_tpu.utils.io import l2_normalize

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0,
                        topk_window=6, max_ctx_l=256),
        eval=EvalConfig(query_chunk=4, video_batch=2),
    )


@pytest.fixture(scope="module")
def short_ds(cfg):
    """Two videos: one SHORTER than a window (20 < 32 clips), one tiny (3)."""
    rng = np.random.default_rng(0)
    vids = {
        "short": l2_normalize(rng.normal(size=(20, DIM)).astype(np.float32)),
        "tiny": l2_normalize(rng.normal(size=(3, DIM)).astype(np.float32)),
    }
    toks, clss, examples = {}, {}, []
    for vid, (st, ed) in [("short", (4.0, 9.0)), ("tiny", (0.0, 2.0))]:
        qid = f"{vid}_q0"
        toks[qid] = rng.normal(size=(1, DIM)).astype(np.float32)  # 1 token
        clss[qid] = l2_normalize(rng.normal(size=(1, DIM)).astype(np.float32))
        examples.append(QueryExample(
            query_id=qid, query="q", video_id=vid, clip_id=vid,
            timestamps=[st, ed], duration=float(len(vids[vid])),
        ))
    text = TextFeatureStore(InMemoryArrayStore(toks), InMemoryArrayStore(clss))
    return GroundingDataset(examples, InMemoryArrayStore(vids), text, cfg.data)


def test_pipeline_on_short_videos(cfg, short_ds):
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, short_ds, cfg)
    for fused in [False, True]:
        subs, ranklists = pipe.run(host_postproc=not fused, fused=fused)
        assert set(ranklists) == {"short_q0", "tiny_q0"}
        # short video: ceil(20/16)+1 = 3 windows; tiny: ceil(3/16)+1 = 2
        assert sorted(ranklists["short_q0"]) == [0, 1, 2]
        assert sorted(ranklists["tiny_q0"]) == [0, 1]
        for row in subs["fusion"]:
            assert len(row["predicted_times"]) >= 1
            for t in row["predicted_times"]:
                vid_len = short_ds.video_features(row["clip_id"])[0].shape[0]
                assert -1e-4 <= t[0] <= vid_len + 1e-4


def test_train_sampling_on_short_video(cfg, short_ds):
    rng = np.random.default_rng(1)
    s = short_ds.sample_train(0, rng)  # "short" example
    assert s["pos_mask"].sum() > 0
    assert s["neg_mask"].sum() > 0
    c, w = s["span_labels"][0]
    assert 0 < w <= 1 + 1e-6


# -------- reference-generated ragged-edge goldens (VERDICT r1 #8) ----------

import os
import sys
import dataclasses

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "edge_inference.npz")


@pytest.fixture(scope="module")
def edge_golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("no edge golden fixture")
    return dict(np.load(GOLDEN).items())


@pytest.fixture(scope="module")
def edge_setup(edge_golden):
    g = edge_golden
    max_v_l, topk_window, dim = g["meta"].tolist()
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=max_v_l),
        data=DataConfig(max_v_l=max_v_l, max_q_l=8, clip_length=1.0,
                        topk_window=topk_window, max_ctx_l=128,
                        normalize_v=False, normalize_t=False),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, max_before_nms=200,
                        query_chunk=2, video_batch=2),
    )
    vids = {k[6:]: g[k] for k in g if k.startswith("video_")}
    qids = sorted(k[4:] for k in g if k.startswith("tok_"))
    examples = [QueryExample(query_id=q, query="", video_id=q.rsplit("_", 1)[0],
                             clip_id=q.rsplit("_", 1)[0], timestamps=[0, 0],
                             duration=0.0) for q in qids]
    ds = GroundingDataset(
        examples, InMemoryArrayStore(vids),
        TextFeatureStore(InMemoryArrayStore({q: g[f"tok_{q}"] for q in qids}),
                         InMemoryArrayStore({q: g[f"cls_{q}"][None] for q in qids})),
        cfg.data,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_ckpt import torch_state_dict_to_params

    from cone_tpu.models.cone import ConeModel

    sd = {k[3:]: v for k, v in g.items() if k.startswith("w::")}
    params = torch_state_dict_to_params(sd, cfg.model)
    return cfg, ds, ConeModel(cfg.model), params, qids


def _assert_ranklist_matches(got, want_ids, wscores):
    """Exact id order when scores are distinct; within a tied-score group
    any permutation is valid (torch.sort tie order is unspecified)."""
    assert len(got) == len(want_ids)
    by_score = {}
    for i, s in enumerate(np.round(wscores, 10)):
        by_score.setdefault(s, set()).add(i)
    for a, b in zip(got, want_ids):
        if a != b:
            assert by_score[np.round(wscores[a], 10)] == \
                   by_score[np.round(wscores[b], 10)] or a in by_score.get(
                       np.round(wscores[b], 10), set()), (got, want_ids)


def test_edge_golden_host_path(edge_golden, edge_setup):
    """Host (reference-exact) path reproduces the reference on videos
    shorter than a stride / window, exact-multiple lengths, and the
    duplicate-candidate dedup (vtiny windows 0 & 1 are the same slice)."""
    g = edge_golden
    cfg, ds, model, params, qids = edge_setup
    pipe = InferencePipeline(model, params, ds, cfg)
    subs, ranklists = pipe.run(host_postproc=True)
    for q in qids:
        _assert_ranklist_matches(ranklists[q], g[f"{q}_ranklist"].tolist(),
                                 g[f"{q}_wscores"])
    for name in ["fusion", "proposal", "matching"]:
        by_qid = {r["query_id"]: r for r in subs[name]}
        for q in qids:
            want = g[f"{q}_{name}"]
            got = np.asarray(by_qid[q]["predicted_times"], np.float64)
            assert got.shape == want.shape, (q, name, got.shape, want.shape)
            np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-3,
                                       err_msg=f"{q} {name}")
            np.testing.assert_allclose(got[:, 2:], want[:, 2:], atol=2e-3,
                                       err_msg=f"{q} {name}")


def test_edge_golden_nms_disabled(edge_golden, edge_setup):
    """nms_thd=-1: top max_after_nms by score, no suppression
    (cone/inference.py:125-127)."""
    g = edge_golden
    cfg, ds, model, params, qids = edge_setup
    cfg_n = cfg.replace(eval=dataclasses.replace(cfg.eval, nms_thd=-1.0))
    pipe = InferencePipeline(model, params, ds, cfg_n)
    subs, _ = pipe.run(host_postproc=True)
    for name in ["fusion", "proposal", "matching"]:
        by_qid = {r["query_id"]: r for r in subs[name]}
        for q in qids:
            want = g[f"{q}_{name}_nonms"]
            got = np.asarray(by_qid[q]["predicted_times"], np.float64)
            assert got.shape == want.shape, (q, name, got.shape, want.shape)
            np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-3,
                                       err_msg=f"{q} {name} nonms")
            np.testing.assert_allclose(got[:, 2:], want[:, 2:], atol=2e-3,
                                       err_msg=f"{q} {name} nonms")


def test_edge_golden_dedup_exercised(edge_golden):
    """The fixture provably covers the dict dedup: vtiny emits duplicate
    candidates (windows 0 and 1 are the same slice)."""
    g = edge_golden
    assert int(g["vtiny_q0_n_before_dedup"]) > int(g["vtiny_q0_n_after_dedup"])


def test_edge_golden_fused_path(edge_golden, edge_setup):
    """The one-dispatch fused path handles the same ragged geometries."""
    g = edge_golden
    cfg, ds, model, params, qids = edge_setup
    pipe = InferencePipeline(model, params, ds, cfg)
    subs, ranklists = pipe.run(host_postproc=False, fused=True)
    score_col = {"fusion": 4, "proposal": 2, "matching": 3}
    for name in ["fusion", "proposal", "matching"]:
        by_qid = {r["query_id"]: r for r in subs[name]}
        for q in qids:
            want = g[f"{q}_{name}"]
            got = np.asarray(by_qid[q]["predicted_times"], np.float64)
            assert got.shape[0] == want.shape[0], (q, name, got.shape)
            np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-3,
                                       err_msg=f"{q} {name} fused")
            np.testing.assert_allclose(got[:, 2], want[:, score_col[name]],
                                       atol=2e-3, err_msg=f"{q} {name} fused")
