"""End-to-end inference pipeline on synthetic data + metric evaluators."""

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.eval.metrics import (
    evaluate_ego4d_nlq,
    evaluate_recall_table,
    evaluate_window_ranklists,
)
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32, adapter_module="none",
        ),
        data=DataConfig(
            max_v_l=32, max_q_l=8, clip_length=1.0, topk_window=5,
            max_ctx_l=256, max_windows=5,
        ),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=4),
    )


@pytest.fixture(scope="module")
def ds(cfg):
    return make_synthetic_dataset(
        cfg.data, n_videos=3, queries_per_video=3, ctx_l_range=(100, 220),
        dim=DIM, signal=3.0, seed=5,
    )


@pytest.fixture(scope="module")
def pipeline(cfg, ds):
    model, params = build_model_and_params(cfg.model, seed=0)
    return InferencePipeline(model, params, ds, cfg)


@pytest.fixture(scope="module")
def results(pipeline):
    subs, ranklists = pipeline.run(host_postproc=True)
    return subs, ranklists


def test_ranklists_are_window_permutations(ds, results, cfg):
    _, ranklists = results
    stride = cfg.data.max_v_l // 2
    assert set(ranklists) == {e.query_id for e in ds.examples}
    for ex in ds.examples:
        ctx_l = len(ds.video_features(ex.clip_id)[0])
        import math

        n_win = math.ceil(ctx_l / stride) + 1
        assert sorted(ranklists[ex.query_id]) == list(range(n_win))


def test_coarse_recall_with_planted_signal(ds, results, cfg):
    """With adapter=none and a strong planted signal, the GT window must be
    near the top of every ranklist."""
    _, ranklists = results
    gt = [
        dict(query_id=e.query_id, timestamps=e.timestamps) for e in ds.examples
    ]
    recall = evaluate_window_ranklists(
        ranklists, gt, [1, 5], cfg.data.clip_length, cfg.data.max_v_l
    )
    assert recall[0] >= 0.8
    assert recall[1] == 1.0


def test_submission_format(results, cfg):
    subs, _ = results
    for name in ["fusion", "proposal", "matching"]:
        for row in subs[name]:
            times = row["predicted_times"]
            assert 1 <= len(times) <= cfg.eval.max_after_nms
            scores = [t[2 + {"proposal": 0, "matching": 1, "fusion": 2}[name]]
                      for t in times]
            assert scores == sorted(scores, reverse=True)
            for t in times:
                assert len(t) == 5  # st, ed, prop, match, fused
                assert t[0] <= t[1] + 1e-6


def test_fused_path_matches_staged(pipeline, results):
    subs, ranklists = results
    fused_subs, fused_rank = pipeline.run(host_postproc=False, fused=True)
    assert fused_rank == ranklists
    staged = {r["query_id"]: r for r in pipeline.postprocess_device(
        pipeline.fine(ranklists))}
    for row in fused_subs["fusion"]:
        ref = staged[row["query_id"]]
        got = np.asarray([t for t in row["predicted_times"]])
        want = np.asarray([t for t in ref["predicted_times"]])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_stack_cache_reuses_and_matches(pipeline):
    """Steady-state serving: the second fused run must hit the stacked-group
    LRU (same device buffers, no re-stacking) and return identical results;
    disabling the cache must also return identical results."""
    subs1, rank1 = pipeline.run(host_postproc=False, fused=True)
    cache = dict(pipeline._stack_cache)
    assert cache, "fused run should have populated the stack cache"
    subs2, rank2 = pipeline.run(host_postproc=False, fused=True)
    for k, v in pipeline._stack_cache.items():
        assert v[0] is cache[k][0], "stacked tensors must be reused"
    assert rank2 == rank1 and subs2 == subs1
    pipeline.stack_cache = False
    try:
        subs3, rank3 = pipeline.run(host_postproc=False, fused=True)
    finally:
        pipeline.stack_cache = True
    assert rank3 == rank1 and subs3 == subs1


@pytest.mark.heavy  # ~29 s (compiles its own capped pipeline) — keep the
# fast lane under 5 min; the release gate runs it
def test_fused_stack_cache_byte_bound_evicts(cfg, ds):
    """The stacked-group LRU is bounded in BYTES (a MAD fp32 group stacks
    ~150 MB; a count bound could pin ~10 GB of duplicate HBM). With a tiny
    cap, the cache must keep at most the newest entry per insert round and
    results must stay identical to the uncapped run."""
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, cfg)
    subs_ref, rank_ref = pipe.run(host_postproc=False, fused=True)
    full_entries = len(pipe._stack_cache)
    assert full_entries >= 2  # 3 videos -> several distinct groups
    total = sum(n for _, n in pipe._stack_cache.values())
    assert total > 0

    capped = InferencePipeline(model, params, ds, cfg)
    capped.stack_cache_bytes = 1  # force eviction down to one entry
    subs_cap, rank_cap = capped.run(host_postproc=False, fused=True)
    assert len(capped._stack_cache) == 1  # never exceeds the floor of one
    assert rank_cap == rank_ref and subs_cap == subs_ref
    # and a second capped run (all misses) still matches
    subs_cap2, rank_cap2 = capped.run(host_postproc=False, fused=True)
    assert rank_cap2 == rank_ref and subs_cap2 == subs_ref


def test_device_postproc_agrees_with_host(pipeline, results):
    subs, ranklists = results
    rows = pipeline.fine(ranklists)
    fast = pipeline.postprocess_device(rows)
    slow = {r["query_id"]: r for r in subs["fusion"]}
    for row in fast:
        ref = slow[row["query_id"]]
        got = np.asarray([t[:2] for t in row["predicted_times"]])
        want = np.asarray([t[:2] for t in ref["predicted_times"]])
        n = min(len(got), len(want))
        np.testing.assert_allclose(got[:n], want[:n], atol=2e-3)
        got_s = np.asarray([t[2] for t in row["predicted_times"]])
        want_s = np.asarray([t[4] for t in ref["predicted_times"]])
        np.testing.assert_allclose(got_s[:n], want_s[:n], atol=1e-3)


def test_recall_table_evaluator_perfect_predictions(ds):
    subs = [
        dict(query_id=e.query_id, predicted_times=[list(e.timestamps) + [1.0]])
        for e in ds.examples
    ]
    gt = [dict(query_id=e.query_id, timestamps=e.timestamps) for e in ds.examples]
    rec = evaluate_recall_table(subs, gt, [0.1, 0.3, 0.5], [1, 5])
    np.testing.assert_allclose(rec, 1.0)


def test_ego4d_evaluator_nested_format(ds):
    gt = {"videos": [{"clips": []}]}
    preds = []
    for e in ds.examples:
        gt["videos"][0]["clips"].append(
            {
                "clip_uid": e.query_id + "_clip",
                "annotations": [
                    {
                        "annotation_uid": e.query_id,
                        "language_queries": [
                            {
                                "clip_start_sec": e.timestamps[0],
                                "clip_end_sec": e.timestamps[1],
                            }
                        ],
                    }
                ],
            }
        )
        preds.append(
            dict(
                clip_uid=e.query_id + "_clip", annotation_uid=e.query_id,
                query_idx=0,
                predicted_times=[[e.timestamps[0], e.timestamps[1], 1.0]],
            )
        )
    results, miou = evaluate_ego4d_nlq(preds, gt, [0.3, 0.5], [1, 5])
    np.testing.assert_allclose(results, 1.0)
    assert miou == 1.0

    # shifted predictions fail high-IoU thresholds
    bad = [
        dict(p, predicted_times=[[p["predicted_times"][0][0] + 100,
                                  p["predicted_times"][0][1] + 100, 1.0]])
        for p in preds
    ]
    results, miou = evaluate_ego4d_nlq(bad, gt, [0.3, 0.5], [1, 5])
    np.testing.assert_allclose(results, 0.0)


def test_no_sort_results_skips_within_window_sort(cfg, ds):
    """eval.no_sort_results keeps candidates in raw proposal order inside
    each window (cone/inference.py:81-82): same candidate multiset, possibly
    different order, downstream fusion unaffected by the dict dedup."""
    import dataclasses

    model, params = build_model_and_params(cfg.model, seed=0)
    cfg_ns = cfg.replace(eval=dataclasses.replace(cfg.eval, no_sort_results=True))
    pipe_sorted = InferencePipeline(model, params, ds, cfg)
    pipe_raw = InferencePipeline(model, params, ds, cfg_ns)

    rank = pipe_sorted.coarse()
    rows_s = pipe_sorted.fine(rank)
    rows_r = pipe_raw.fine(rank)

    saw_order_diff = False
    for rs, rr in zip(rows_s, rows_r):
        cs = pipe_sorted.candidates_host(rs)
        cr = pipe_raw.candidates_host(rr)
        assert sorted(map(tuple, cs)) == sorted(map(tuple, cr))
        # sorted path is non-increasing in fg prob within each window
        k = int(rs["win_valid"].sum())
        nq = rs["prob"].shape[1]
        for w in range(k):
            probs = [c[2] for c in cs[w * nq : (w + 1) * nq]]
            assert probs == sorted(probs, reverse=True)
        if cs != cr:
            saw_order_diff = True
    assert saw_order_diff, "expected at least one within-window order change"


def test_ctx_buckets_match_unbucketed(cfg, ds):
    """eval.ctx_buckets pads each video to its smallest fitting bucket; the
    results must be identical to single-shape max_ctx_l padding (window math
    is mask-driven, so extra padding is inert), for both the staged and the
    fused path with mixed-bucket corpora."""
    import dataclasses

    model, params = build_model_and_params(cfg.model, seed=0)
    # ds has ctx_l in (100, 220) and max_ctx_l=256 -> buckets split videos
    cfg_b = cfg.replace(eval=dataclasses.replace(
        cfg.eval, ctx_buckets=(128, 192), video_batch=2))
    plain = InferencePipeline(model, params, ds, cfg)
    bucketed = InferencePipeline(model, params, ds, cfg_b)

    subs1, rank1 = plain.run(host_postproc=True)
    subs2, rank2 = bucketed.run(host_postproc=True)
    assert rank1 == rank2
    assert subs1 == subs2

    fs1, fr1 = plain.run(host_postproc=False, fused=True)
    fs2, fr2 = bucketed.run(host_postproc=False, fused=True)
    assert fr1 == fr2
    for name in fs1:
        by_qid = {r["query_id"]: r for r in fs1[name]}
        for row in fs2[name]:
            got = np.asarray(row["predicted_times"], np.float64)
            want = np.asarray(by_qid[row["query_id"]]["predicted_times"],
                              np.float64)
            assert got.shape == want.shape, row["query_id"]
            np.testing.assert_allclose(got, want, atol=1e-4)
    # and the bucketing actually happened: padded lengths differ per video
    lens = {bucketed._device_video(c)[0].shape[0] for c in
            {e.clip_id for e in ds.examples}}
    assert len(lens) > 1, lens
