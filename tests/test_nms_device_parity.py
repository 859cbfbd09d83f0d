"""Device-path NMS parity with the reference-exact host path.

Round-2 review finding: the device paths never applied `max_before_nms`
(the host's top-200 truncation before NMS, cone/inference.py:103-127) and
had no dict-dedup, so at TAN-MAD geometry (30 windows x 10 proposals = 300
candidates > 200) `--fused` could legitimately diverge from the host path.
These tests pin:

  * dedup_spans_device == the reference dict build (first slot, last scores)
  * max_before_nms truncation on device == host list slicing
  * fused == host end-to-end at TAN-MAD geometry (300 candidates)
  * fused == host with nms_thd=-1 (suppression off: dedup + sort + top-k)
  * crafted duplicate/tie grids through postprocess_device == postprocess_host
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig, TanConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params
from cone_tpu.ops.nms import dedup_spans_device, temporal_nms_device, temporal_nms_host

DIM = 32


# ------------------------------------------------------------------ units --


def _host_dict_dedup(spans, scores, valid):
    """The reference's dict build (cone/inference.py:214-216), literally."""
    ret = {}
    for i in range(len(spans)):
        if not valid[i]:
            continue
        ret[(float(spans[i, 0]), float(spans[i, 1]))] = float(scores[i])
    return ret


def test_dedup_spans_device_matches_dict_semantics():
    rng = np.random.default_rng(0)
    spans = rng.integers(0, 6, (40, 2)).astype(np.float32)  # many collisions
    scores = rng.standard_normal(40).astype(np.float32)
    valid = rng.random(40) > 0.2
    (new_scores,), keep = jax.device_get(
        dedup_spans_device(jnp.asarray(spans), (jnp.asarray(scores),),
                           jnp.asarray(valid))
    )
    ret = _host_dict_dedup(spans, scores, valid)
    # one survivor per distinct valid key
    assert int(keep.sum()) == len(ret)
    seen_keys = []
    for i in np.nonzero(keep)[0]:
        key = (float(spans[i, 0]), float(spans[i, 1]))
        # survivor carries the LAST occurrence's score (the dict value)
        assert new_scores[i] == pytest.approx(ret[key])
        seen_keys.append(key)
    # survivors sit at FIRST-occurrence slots => same order as dict insertion
    assert seen_keys == list(ret.keys())


def test_max_before_nms_device_matches_host_truncation():
    """Candidates past the top-`max_before` by score neither survive nor
    suppress — exactly the host's moments[:max_before] slicing."""
    rng = np.random.default_rng(1)
    n, max_before, max_after = 50, 12, 8
    spans = np.sort(rng.random((n, 2)).astype(np.float32) * 30, axis=-1)
    spans[:, 1] += 0.5
    scores = rng.permutation(n).astype(np.float32) / n  # all distinct
    moments = [[float(s[0]), float(s[1]), float(v)] for s, v in zip(spans, scores)]
    moments.sort(key=lambda m: m[2], reverse=True)
    want = temporal_nms_host(moments[:max_before], 0.4, max_after)

    k_sp, k_sc, k_va = jax.device_get(temporal_nms_device(
        jnp.asarray(spans), jnp.asarray(scores), jnp.ones(n, bool),
        0.4, max_after, max_before_nms=max_before))
    got = [[float(k_sp[i, 0]), float(k_sp[i, 1]), float(k_sc[i])]
           for i in range(max_after) if k_va[i]]
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # and with suppression off, the host's -1 branch takes top max_after of
    # ALL candidates (no max_before truncation, cone/inference.py:199-202)
    k_sp, k_sc, k_va = jax.device_get(temporal_nms_device(
        jnp.asarray(spans), jnp.asarray(scores), jnp.ones(n, bool),
        -1.0, max_after, max_before_nms=max_before))
    assert int(k_va.sum()) == max_after
    np.testing.assert_allclose(
        k_sc[k_va], sorted(scores, reverse=True)[:max_after], atol=1e-6)


# ----------------------------------------------- crafted duplicates / ties --


@pytest.fixture(scope="module")
def cone_cfg():
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
        eval=EvalConfig(nms_thd=0.5, max_after_nms=8, query_chunk=4),
    )


@pytest.fixture(scope="module")
def cone_ds(cone_cfg):
    return make_synthetic_dataset(
        cone_cfg.data, n_videos=3, queries_per_video=3, ctx_l_range=(100, 220),
        dim=DIM, signal=3.0, seed=5,
    )


def _crafted_row(ex, K, NQ, seed):
    """Candidate grid with exact-at-4dp values: duplicate (st, ed) keys
    across windows with different scores, and exact fused-score ties
    across distinct keys."""
    rng = np.random.default_rng(seed)
    spans = rng.integers(0, 64, (K, NQ, 2)).astype(np.float64) / 16.0
    spans.sort(axis=-1)
    spans[..., 1] += 0.25
    prob = rng.integers(0, 64, (K, NQ)).astype(np.float64) / 64.0
    match = rng.integers(0, 64, (K, NQ)).astype(np.float64) / 64.0
    # duplicates: window 2 repeats window 0's first three keys, other scores
    # (host keeps the LAST occurrence's scores at the FIRST slot)
    spans[2, :3] = spans[0, :3]
    # ties: distinct keys with identical (prob, match) => identical fused
    prob[3, :2] = prob[1, :2]
    match[3, :2] = match[1, :2]
    return dict(example=ex, spans_sec=spans.astype(np.float32),
                prob=prob.astype(np.float32), match=match.astype(np.float32),
                win_valid=np.ones(K, bool), cand_valid=None)


def test_device_postproc_dedup_and_ties_match_host(cone_cfg, cone_ds):
    model, params = build_model_and_params(cone_cfg.model, seed=0)
    pipe = InferencePipeline(model, params, cone_ds, cone_cfg)
    rows = [_crafted_row(ex, cone_cfg.data.topk_window, 5, seed=10 + i)
            for i, ex in enumerate(cone_ds.examples[:4])]
    host = pipe.postprocess_host(rows)["fusion"]
    dev = pipe.postprocess_device(rows)
    for h, d in zip(host, dev):
        got = np.asarray([t[:3] for t in d["predicted_times"]])
        want = np.asarray([[t[0], t[1], t[4]] for t in h["predicted_times"]])
        assert got.shape == want.shape, (h["query_id"], got, want)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_postproc_max_before_truncation_matches_host(cone_cfg, cone_ds):
    """Same crafted grids, max_before_nms smaller than the candidate count:
    both paths must truncate identically before suppression."""
    model, params = build_model_and_params(cone_cfg.model, seed=0)
    cfg = cone_cfg.replace(eval=dataclasses.replace(
        cone_cfg.eval, max_before_nms=10))
    pipe = InferencePipeline(model, params, cone_ds, cfg)
    rows = [_crafted_row(ex, cfg.data.topk_window, 5, seed=20 + i)
            for i, ex in enumerate(cone_ds.examples[:4])]
    host = pipe.postprocess_host(rows)["fusion"]
    dev = pipe.postprocess_device(rows)
    for h, d in zip(host, dev):
        got = np.asarray([t[:3] for t in d["predicted_times"]])
        want = np.asarray([[t[0], t[1], t[4]] for t in h["predicted_times"]])
        assert got.shape == want.shape, (h["query_id"], got, want)
        np.testing.assert_allclose(got, want, atol=1e-6)


# ----------------------------------------------------- e2e: fused == host --


def _compare_fused_to_host(subs_host, subs_fused, score_col):
    for name, col in score_col.items():
        by_qid = {r["query_id"]: r for r in subs_host[name]}
        for row in subs_fused[name]:
            want_row = by_qid[row["query_id"]]
            got = np.asarray(
                [[t[0], t[1], t[2]] for t in row["predicted_times"]])
            want = np.asarray(
                [[t[0], t[1], t[col]] for t in want_row["predicted_times"]])
            assert got.shape == want.shape, (
                name, row["query_id"], got, want)
            np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_fused_matches_host_at_tan_mad_geometry():
    """TAN at MAD candidate volume: topk_window=30 x proposal_top_k=10 = 300
    candidates > max_before_nms=200 — the geometry where the round-2 review
    found the device path could diverge. Cell-quantized TAN spans also make
    cross-window duplicates routine, exercising the dedup for real."""
    from cone_tpu.eval.tan_pipeline import TanInferencePipeline
    from cone_tpu.models.tan import ConeTanModel

    nc = 32
    tan = TanConfig(
        num_clips=nc, hidden_size=48, v_feat_dim=DIM, t_feat_dim=DIM,
        txt_hidden_size=48, lstm_layers=2, num_scale_layers=(8, 4),
        map_hidden_sizes=(48, 48), map_kernel_sizes=(5, 5), map_paddings=(4, 0),
    )
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=DIM, v_appear_feat_dim=DIM,
                          v_motion_feat_dim=DIM, adapter_module="linear",
                          max_q_l=8, max_v_l=nc),
        data=DataConfig(dset_name="synthetic", max_v_l=nc, max_q_l=8,
                        clip_length=0.25, topk_window=30, max_ctx_l=768),
        eval=EvalConfig(query_chunk=3, max_before_nms=200, max_after_nms=5),
    )
    # videos long enough for >= 30 windows: stride 16 -> ctx >= 470
    ds = make_synthetic_dataset(
        cfg.data, n_videos=2, queries_per_video=3, ctx_l_range=(500, 700),
        dim=DIM, signal=3.0, seed=21,
    )
    model = ConeTanModel(tan)
    var = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 8, DIM)), jnp.ones((2, 8)), jnp.zeros((2, nc, DIM)),
        jnp.zeros((2, DIM)), jnp.zeros((2, nc, DIM)),
        method=ConeTanModel.init_all,
    )
    pipe = TanInferencePipeline(model, var["params"], ds, cfg, tan,
                                proposal_top_k=10)
    subs_host, rank_host = pipe.run(host_postproc=True)
    subs_fused, rank_fused = pipe.run(host_postproc=False, fused=True)
    assert rank_fused == rank_host
    # the geometry really produces > max_before_nms candidates
    rows = pipe.fine(rank_host)
    n_cands = [len(pipe.candidates_host(r)) for r in rows]
    assert max(n_cands) > cfg.eval.max_before_nms, n_cands
    _compare_fused_to_host(subs_host, subs_fused,
                           {"fusion": 4, "proposal": 2, "matching": 3})


def test_fused_matches_host_with_nms_disabled(cone_cfg, cone_ds):
    """nms_thd=-1: no suppression — host emits the deduped candidates sorted
    by score, truncated to max_after_nms (cone/inference.py:199-202); the
    fused path must agree (and NOT apply max_before_nms, which the host's
    -1 branch skips)."""
    model, params = build_model_and_params(cone_cfg.model, seed=0)
    cfg = cone_cfg.replace(eval=dataclasses.replace(
        cone_cfg.eval, nms_thd=-1.0, max_before_nms=10))
    pipe = InferencePipeline(model, params, cone_ds, cfg)
    subs_host, rank_host = pipe.run(host_postproc=True)
    subs_fused, rank_fused = pipe.run(host_postproc=False, fused=True)
    assert rank_fused == rank_host
    _compare_fused_to_host(subs_host, subs_fused,
                           {"fusion": 4, "proposal": 2, "matching": 3})


def test_fused_matches_host_cone_default(cone_cfg, cone_ds):
    """Default CONE geometry, all three modalities, exact shape match."""
    model, params = build_model_and_params(cone_cfg.model, seed=0)
    pipe = InferencePipeline(model, params, cone_ds, cone_cfg)
    subs_host, rank_host = pipe.run(host_postproc=True)
    subs_fused, rank_fused = pipe.run(host_postproc=False, fused=True)
    assert rank_fused == rank_host
    _compare_fused_to_host(subs_host, subs_fused,
                           {"fusion": 4, "proposal": 2, "matching": 3})
