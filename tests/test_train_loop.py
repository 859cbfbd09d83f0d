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
            # 36 samples x 8 epochs: enough AdamW steps that the loss trend
            # dominates the per-epoch sampling noise (4 epochs = 18 steps
            # proved assertion-flippingly marginal when the loader's rng
            # stream changed)
            bsz=8, n_epoch=8, eval_epoch_interval=4, lr=3e-4,
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
    # mean of the last two epochs vs the first: single-epoch averages over
    # ~5 tiny batches swing +-10% with the sampling stream
    last = np.mean([h["loss_overall"] for h in history[-2:]])
    assert last < history[0]["loss_overall"]
    assert all(np.isfinite(h["loss_overall"]) for h in history)


def test_artifacts_written(trained, cfg):
    workdir, _, _ = trained
    for f in ["config.json", "metrics.jsonl", "train.log.txt",
              "eval_results.txt", "model_latest.msgpack", "model_best.msgpack",
              "best_preds.jsonl"]:
        assert os.path.exists(os.path.join(workdir, f)), f
    records = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    kinds = {r["kind"] for r in records}
    assert kinds == {"hparams", "train_epoch", "eval"}
    evals = [r for r in records if r["kind"] == "eval"]
    assert all(np.isfinite(r["stop_score"]) for r in evals)
    # hparams recorded once at train start, full config tree (the
    # reference's TB hyperparameters text, cone/train.py:128)
    hp = [r for r in records if r["kind"] == "hparams"]
    assert len(hp) == 1 and hp[0]["config"]["model"]["nheads"] == cfg.model.nheads


def test_eval_criterion_losses(trained, cfg, ds):
    """Every train-time eval logs the criterion's loss terms computed on the
    eval split (the reference's eval-loss TensorBoard channel,
    cone/inference.py:30-36, 96-98), and the pass is deterministic — a fixed
    (seed, epoch=0) window draw with dropout off, so curves are comparable
    across epochs."""
    workdir, params, history = trained
    records = [json.loads(l)
               for l in open(os.path.join(workdir, "metrics.jsonl"))]
    evals = [r for r in records if r["kind"] == "eval"]
    assert evals
    for r in evals:
        assert np.isfinite(r["eval_loss_overall"])
        assert np.isfinite(r["eval_loss_span"])
    # also mirrored into the returned history for programmatic use
    eval_epochs = [h for h in history if "eval_loss_overall" in h]
    assert len(eval_epochs) == len(evals)

    from cone_tpu.train.loop import eval_criterion_losses
    from cone_tpu.train.step import make_eval_loss_step

    model, _ = build_model_and_params(cfg.model, seed=0)
    fn = make_eval_loss_step(model, cfg)
    l1 = eval_criterion_losses(fn, params, ds, cfg, adapter_on=True)
    l2 = eval_criterion_losses(fn, params, ds, cfg, adapter_on=True)
    assert l1 == l2  # bit-deterministic
    assert l1["loss_overall"] > 0 and "loss_adapter" in l1
    # adapter gate mirrors training (cone/train.py:73-78)
    assert "loss_adapter" not in eval_criterion_losses(
        fn, params, ds, cfg, adapter_on=False)


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
    restored, _, epoch, _ = ckpt.restore("latest", template)
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


def test_warm_start_init_ckpt(trained, cfg, ds, tmp_path_factory):
    """Weights-only warm start (cli train --init_ckpt): a fresh run seeded
    with a trained checkpoint's params starts where that run left off —
    first-epoch loss far below a cold first epoch — while epochs/optimizer
    restart from scratch (the reference's --resume without --resume_all,
    cone/config.py:63-66)."""
    import dataclasses

    workdir0, _, history0 = trained
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, n_epoch=1, eval_epoch_interval=100))
    wd = str(tmp_path_factory.mktemp("warm"))
    params, history = train(
        cfg2, ds, ds, wd,
        init_ckpt=os.path.join(workdir0, "model_best.msgpack"))
    assert len(history) == 1  # epoch counter NOT restored
    assert history[0]["loss_overall"] < history0[0]["loss_overall"]


def test_load_params_raw_msgpack(cfg, tmp_path):
    """load_params accepts tools/convert_ckpt.py --out files (bare
    {"params": ...} msgpack, no optimizer/epoch wrapper)."""
    from flax.serialization import msgpack_serialize

    from cone_tpu.train.checkpoint import load_params

    import jax

    model, params = build_model_and_params(cfg.model, seed=3)
    path = str(tmp_path / "converted.msgpack")
    with open(path, "wb") as f:
        f.write(msgpack_serialize({"params": jax.device_get(params)}))
    model2, template = build_model_and_params(cfg.model, seed=99)
    loaded = load_params(path, template)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_extra_state_roundtrip(trained, cfg):
    """Early-stop counters persist in the checkpoint (reference saves
    scheduler state, cone/train.py:184-191) and old files without them
    still load."""
    workdir, _, _ = trained
    model, template = build_model_and_params(cfg.model, seed=0)
    ckpt = CheckpointManager(workdir)
    _, _, _, extra = ckpt.restore("latest", template)
    assert "best_score" in extra and "es_cnt" in extra
    assert extra["best_score"] > 0
    # pre-upgrade file (no extra): loads with empty extra
    p = ckpt.save("noextra", template)
    _, _, _, extra2 = ckpt.restore("noextra", template)
    assert extra2 == {}


def test_eval_reports_miou(trained, cfg, ds):
    """Training-loop evals report mean first-prediction IoU alongside recall
    for ego4d-style datasets (cone/inference.py:440-444,
    evaluate_ego4d_nlq.py:95-117)."""
    workdir, params, _ = trained
    model, _ = build_model_and_params(cfg.model, seed=0)
    res = evaluate(model, params, ds, cfg)
    for name in ("fusion", "proposal", "matching"):
        assert 0.0 <= res[f"miou_{name}"] <= 1.0
        assert "mIoU" in res["tables"][name]
    # perfect predictions give mIoU 1.0
    from cone_tpu.eval.metrics import mean_first_iou

    gt = [dict(query_id=e.query_id, timestamps=e.timestamps) for e in ds.examples]
    subs = [dict(query_id=e.query_id,
                 predicted_times=[list(e.timestamps) + [1.0]])
            for e in ds.examples]
    assert mean_first_iou(subs, gt) == pytest.approx(1.0)


def test_bf16_training_losses_fall(cfg, ds, tmp_path_factory):
    """model.compute_dtype=bfloat16 (the 7.3x-faster TPU training path,
    docs/RESULTS.md) trains: losses decrease on the planted-signal set."""
    import dataclasses

    cfg_bf16 = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, n_epoch=6,
                                  eval_epoch_interval=100),
    )
    workdir = str(tmp_path_factory.mktemp("bf16run"))
    params, history = train(cfg_bf16, ds, ds, workdir)
    losses = [h["loss_overall"] for h in history]
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < losses[0]


def test_rbg_rng_training_losses_fall(cfg, ds, tmp_path_factory):
    """train.rng_impl="rbg" (XLA RngBitGenerator dropout masks) trains
    correctly: the typed key flows through split/dropout and losses
    decrease on the planted-signal set. The knob is experimental — on
    real v5e the full train step measured 3.7x SLOWER with rbg than
    threefry (tools/bench_rng.py, docs/RESULTS.md round 4), so no
    preset enables it; this pins that it stays functional."""
    import dataclasses

    cfg_rbg = cfg.replace(
        train=dataclasses.replace(cfg.train, n_epoch=6, rng_impl="rbg",
                                  eval_epoch_interval=100),
    )
    workdir = str(tmp_path_factory.mktemp("rbgrun"))
    params, history = train(cfg_rbg, ds, ds, workdir)
    losses = [h["loss_overall"] for h in history]
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < losses[0]


def test_fused_train_eval_matches_host(trained, cfg, ds):
    """eval.fused_train_eval routes training-loop evals through the fused
    device path; stop score and recall tables must be bit-identical to the
    reference-exact host postproc (the parity the device dedup +
    max_before_nms work bought)."""
    import dataclasses

    workdir, params, _ = trained
    model, _ = build_model_and_params(cfg.model, seed=0)
    host = evaluate(model, params, ds, cfg)
    cfg_f = cfg.replace(eval=dataclasses.replace(
        cfg.eval, fused_train_eval=True))
    fused = evaluate(model, params, ds, cfg_f, host_postproc=False, fused=True)
    assert fused["stop_score"] == pytest.approx(host["stop_score"], abs=1e-9)
    for name in ("fusion", "proposal", "matching"):
        np.testing.assert_array_equal(
            host[f"recall_{name}"], fused[f"recall_{name}"])


def test_debug_smoke_mode(cfg, ds, tmp_path_factory):
    """train.debug caps epochs at 3 batches and evals at one query chunk
    (the reference's --debug break-all-loops flag, cone/config.py:27-28)."""
    import dataclasses

    cfg_d = cfg.replace(train=dataclasses.replace(
        cfg.train, debug=True, n_epoch=2, eval_epoch_interval=1))
    workdir = str(tmp_path_factory.mktemp("dbgrun"))
    params, history = train(cfg_d, ds, ds, workdir)
    assert len(history) == 2
    assert all(np.isfinite(h["loss_overall"]) for h in history)
    # eval truncation: the written predictions cover one chunk, not all 36
    import json as _json

    preds = [_json.loads(l)
             for l in open(os.path.join(workdir, "latest_preds.jsonl"))]
    assert len(preds) == max(cfg_d.eval.query_chunk, 8)

    model, _ = build_model_and_params(cfg_d.model, seed=0)
    res = evaluate(model, params, ds, cfg_d)
    assert len(res["submissions"]["fusion"]) == max(cfg_d.eval.query_chunk, 8)
    assert np.isfinite(res["stop_score"])


def test_multiscale_train_loop(cfg, ds, tmp_path_factory):
    """train.multiscale swaps in the ECCV'22 leaderboard loader end-to-end
    (scripts/train_ego4d_leaderboard.sh recipe): 4 windows per example per
    batch, adapter NCE on the standard rows, checkpoints/evals as usual."""
    import dataclasses

    cfg_m = cfg.replace(train=dataclasses.replace(
        cfg.train, multiscale=True, n_epoch=2, eval_epoch_interval=1,
        start_epoch_for_adapter=0, debug=True))
    workdir = str(tmp_path_factory.mktemp("msrun"))
    params, history = train(cfg_m, ds, ds, workdir)
    assert len(history) == 2
    assert all(np.isfinite(h["loss_overall"]) for h in history)
    assert all("loss_adapter" in h for h in history)
    assert os.path.exists(os.path.join(workdir, "model_latest.msgpack"))
