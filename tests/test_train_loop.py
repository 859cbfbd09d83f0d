"""Full training loop on synthetic data: losses fall, eval runs, checkpoints
and logs are written, resume restores state."""

import json
import os

import numpy as np
import pytest

from cone_tpu.config import (
    ConeConfig, DataConfig, EvalConfig, LossConfig, ModelConfig, TrainConfig,
)
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.models.init import build_model_and_params
from cone_tpu.train.checkpoint import CheckpointManager
from cone_tpu.train.loop import evaluate, train

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32,
        ),
        data=DataConfig(
            dset_name="synthetic", max_v_l=32, max_q_l=8, clip_length=1.0,
            topk_window=5, max_ctx_l=256, max_windows=5,
        ),
        train=TrainConfig(
            bsz=8, n_epoch=4, eval_epoch_interval=2, lr=3e-4,
            start_epoch_for_adapter=1, save_interval=100, max_es_cnt=10,
        ),
        eval=EvalConfig(query_chunk=4),
    )


@pytest.fixture(scope="module")
def ds(cfg):
    return make_synthetic_dataset(
        cfg.data, n_videos=6, queries_per_video=6, ctx_l_range=(100, 200),
        dim=DIM, signal=3.0, seed=7,
    )


@pytest.fixture(scope="module")
def trained(cfg, ds, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("run"))
    params, history = train(cfg, ds, ds, workdir)
    return workdir, params, history


def test_losses_fall(trained):
    _, _, history = trained
    assert history[-1]["loss_overall"] < history[0]["loss_overall"]
    assert all(np.isfinite(h["loss_overall"]) for h in history)


def test_artifacts_written(trained, cfg):
    workdir, _, _ = trained
    for f in ["config.json", "metrics.jsonl", "train.log.txt",
              "eval_results.txt", "model_latest.msgpack", "model_best.msgpack",
              "best_preds.jsonl"]:
        assert os.path.exists(os.path.join(workdir, f)), f
    records = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    kinds = {r["kind"] for r in records}
    assert kinds == {"train_epoch", "eval"}
    evals = [r for r in records if r["kind"] == "eval"]
    assert all(np.isfinite(r["stop_score"]) for r in evals)


def test_eval_scores_improve_over_untrained(trained, cfg, ds):
    workdir, params, _ = trained
    model, params0 = build_model_and_params(cfg.model, seed=123)
    res0 = evaluate(model, params0, ds, cfg)
    res1 = evaluate(model, params, ds, cfg)
    assert res1["stop_score"] >= res0["stop_score"]
    assert res1["window_recall"][-1] > 0


def test_checkpoint_roundtrip(trained, cfg):
    workdir, params, _ = trained
    model, template = build_model_and_params(cfg.model, seed=0)
    ckpt = CheckpointManager(workdir)
    restored, _, epoch = ckpt.restore("latest", template)
    import jax

    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(restored)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert epoch == cfg.train.n_epoch - 1
    # config snapshot round-trips
    cfg2 = CheckpointManager.load_config(workdir)
    assert cfg2.model.hidden_dim == cfg.model.hidden_dim


def test_bf16_training_losses_fall(cfg, ds, tmp_path_factory):
    """model.compute_dtype=bfloat16 (the 7.3x-faster TPU training path,
    docs/RESULTS.md) trains: losses decrease on the planted-signal set."""
    import dataclasses

    cfg_bf16 = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, n_epoch=2,
                                  eval_epoch_interval=100),
    )
    workdir = str(tmp_path_factory.mktemp("bf16run"))
    params, history = train(cfg_bf16, ds, ds, workdir)
    losses = [h["loss_overall"] for h in history]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
