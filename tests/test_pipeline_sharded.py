"""Inference pipeline with the fine stage sharded over the 8-device mesh."""

import jax
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params
from cone_tpu.parallel.mesh import make_mesh

DIM = 32


def test_sharded_pipeline_matches_single(rng):
    assert len(jax.devices()) == 8
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32,
                          adapter_module="none"),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0, topk_window=4,
                        max_ctx_l=256),
        eval=EvalConfig(query_chunk=8),  # divisible by the 8-way mesh
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=8,
                                ctx_l_range=(100, 200), dim=DIM, signal=3.0,
                                seed=21)
    model, params = build_model_and_params(cfg.model, seed=0)

    single = InferencePipeline(model, params, ds, cfg)
    subs1, rank1 = single.run(host_postproc=True)

    sharded = InferencePipeline(model, params, ds, cfg, mesh=make_mesh(8))
    subs2, rank2 = sharded.run(host_postproc=True)

    assert rank1 == rank2
    by_qid = {r["query_id"]: r for r in subs1["fusion"]}
    for row in subs2["fusion"]:
        ref = by_qid[row["query_id"]]
        got = np.asarray(row["predicted_times"], np.float64)
        want = np.asarray(ref["predicted_times"], np.float64)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_sharded_fused_path(rng):
    """The fused serving path shards its video-batch axis over the mesh."""
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32,
                          adapter_module="none"),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0, topk_window=4,
                        max_ctx_l=256),
        eval=EvalConfig(query_chunk=8, video_batch=8),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=8, queries_per_video=2,
                                ctx_l_range=(100, 200), dim=DIM, signal=3.0,
                                seed=23)
    model, params = build_model_and_params(cfg.model, seed=0)

    single = InferencePipeline(model, params, ds, cfg)
    subs1, rank1 = single.run(host_postproc=False, fused=True)
    sharded = InferencePipeline(model, params, ds, cfg, mesh=make_mesh(8))
    subs2, rank2 = sharded.run(host_postproc=False, fused=True)

    assert rank1 == rank2
    by_qid = {r["query_id"]: r for r in subs1["fusion"]}
    for row in subs2["fusion"]:
        got = np.asarray(row["predicted_times"], np.float64)
        want = np.asarray(by_qid[row["query_id"]]["predicted_times"], np.float64)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_sharded_fused_mad_geometry(rng):
    """SURVEY §7.2 step 9 / VERDICT r1 #10: the fused sharded pipeline at
    MAD geometry — window 125, topk 30, multi-thousand-clip videos, ctx
    buckets — equals single-device."""
    dim = 64
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=125,
                          adapter_module="linear"),
        data=DataConfig(dset_name="mad", max_v_l=125, clip_length=0.2,
                        max_q_l=8, topk_window=30, max_ctx_l=4096),
        eval=EvalConfig(query_chunk=4, video_batch=8,
                        ctx_buckets=(2048, 3072)),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=4, queries_per_video=4,
                                ctx_l_range=(1500, 3900), dim=dim,
                                signal=3.0, seed=29)
    model, params = build_model_and_params(cfg.model, seed=0)

    single = InferencePipeline(model, params, ds, cfg)
    subs1, rank1 = single.run(host_postproc=False, fused=True)
    sharded = InferencePipeline(model, params, ds, cfg, mesh=make_mesh(8))
    subs2, rank2 = sharded.run(host_postproc=False, fused=True)

    assert rank1 == rank2
    for name in subs1:
        by_qid = {r["query_id"]: r for r in subs1[name]}
        for row in subs2[name]:
            got = np.asarray(row["predicted_times"], np.float64)
            want = np.asarray(by_qid[row["query_id"]]["predicted_times"],
                              np.float64)
            assert got.shape == want.shape, (name, row["query_id"])
            np.testing.assert_allclose(got, want, atol=1e-3,
                                       err_msg=f"{name} {row['query_id']}")


def test_sharded_fused_int8_corpus_matches_single(rng):
    """mesh DP x eval.corpus_dtype=int8 compose: the sharded fused pipeline
    over a quantized corpus equals single-device over the same corpus."""
    import dataclasses

    dim = 32
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=32,
                          adapter_module="none"),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0,
                        topk_window=5, max_ctx_l=256, max_windows=5),
        eval=EvalConfig(query_chunk=4, video_batch=8, corpus_dtype="int8"),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=4, queries_per_video=4,
                                ctx_l_range=(100, 220), dim=dim,
                                signal=3.0, seed=11)
    model, params = build_model_and_params(cfg.model, seed=0)

    single = InferencePipeline(model, params, ds, cfg)
    subs1, rank1 = single.run(host_postproc=False, fused=True)
    sharded = InferencePipeline(model, params, ds, cfg, mesh=make_mesh(8))
    subs2, rank2 = sharded.run(host_postproc=False, fused=True)

    assert rank1 == rank2
    assert np.asarray(single._device_video(ds.examples[0].clip_id)[0]).dtype == np.int8
    for name in subs1:
        by_qid = {r["query_id"]: r for r in subs1[name]}
        for row in subs2[name]:
            got = np.asarray(row["predicted_times"], np.float64)
            want = np.asarray(by_qid[row["query_id"]]["predicted_times"],
                              np.float64)
            assert got.shape == want.shape, (name, row["query_id"])
            np.testing.assert_allclose(got, want, atol=1e-3)
