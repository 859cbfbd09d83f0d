"""Full training loop with the TAN model family (config-driven dispatch)."""

import os

import numpy as np
import pytest

from cone_tpu.config import (
    ConeConfig, DataConfig, EvalConfig, ModelConfig, TanConfig, TrainConfig,
)
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.train.loop import train

DIM = 32
NC = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(model_family="tan", t_feat_dim=DIM,
                          v_appear_feat_dim=DIM, v_motion_feat_dim=DIM,
                          max_q_l=8, max_v_l=NC, adapter_module="linear"),
        tan=TanConfig(num_clips=NC, hidden_size=48, v_feat_dim=DIM,
                      t_feat_dim=DIM, txt_hidden_size=48, lstm_layers=2,
                      num_scale_layers=(8, 4), map_hidden_sizes=(48, 48),
                      map_kernel_sizes=(5, 5), map_paddings=(4, 0),
                      proposal_top_k=5),
        data=DataConfig(dset_name="synthetic", max_v_l=NC, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        train=TrainConfig(bsz=8, n_epoch=2, eval_epoch_interval=2,
                          save_interval=100, start_epoch_for_adapter=0),
        eval=EvalConfig(query_chunk=4),
    )


def test_tan_family_train_loop(cfg, tmp_path):
    ds = make_synthetic_dataset(cfg.data, n_videos=4, queries_per_video=4,
                                ctx_l_range=(90, 180), dim=DIM, signal=3.0,
                                seed=13)
    workdir = str(tmp_path / "tanrun")
    params, history = train(cfg, ds, ds, workdir)
    assert len(history) == 2
    assert all(np.isfinite(h["loss_overall"]) for h in history)
    assert "loss_bce" in history[0] and "loss_adapter" in history[0]
    assert os.path.exists(os.path.join(workdir, "model_best.msgpack"))
    # config round-trip preserves the tan section
    from cone_tpu.train.checkpoint import CheckpointManager

    cfg2 = CheckpointManager.load_config(workdir)
    assert cfg2.model.model_family == "tan"
    assert cfg2.tan.num_scale_layers == (8, 4)


def test_plateau_and_early_stop_state_survive_resume(cfg, tmp_path, monkeypatch):
    """A resumed TAN run continues its plateau/early-stop counters instead
    of re-arming fresh patience windows (the reference checkpoints
    lr_scheduler.state_dict(), cone/train.py:184-191). Eval scores are
    stubbed to a deterministic decreasing sequence."""
    import dataclasses

    import cone_tpu.train.loop as loop_mod
    from cone_tpu.train.checkpoint import CheckpointManager
    from cone_tpu.train.loop import build_family

    scores = iter([0.5, 0.4, 0.3, 0.2])

    def fake_eval(model, params, eval_ds, cfg_, mesh=None, **kw):
        return {"tables": {}, "submissions": {"fusion": []},
                "ranklists": {}, "stop_score": next(scores)}

    monkeypatch.setattr(loop_mod, "evaluate", fake_eval)
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=2,
                                ctx_l_range=(90, 120), dim=DIM, signal=3.0,
                                seed=3)
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, n_epoch=2, eval_epoch_interval=1, plateau_patience=10))
    workdir = str(tmp_path / "resume")
    train(cfg2, ds, ds, workdir)

    model, template = build_family(cfg2, seed=cfg2.train.seed)
    ckpt = CheckpointManager(workdir)
    _, _, epoch, extra = ckpt.restore("latest", template)
    assert epoch == 1
    assert extra["best_score"] == pytest.approx(0.5)
    assert extra["es_cnt"] == 1
    assert extra["plateau_best"] == pytest.approx(0.5)
    assert extra["plateau_num_bad"] == 1

    # resume two more epochs: counters continue from 1 (a reset would see
    # best_score=0, treat 0.3 as an improvement and land at es_cnt=1)
    cfg3 = cfg2.replace(train=dataclasses.replace(cfg2.train, n_epoch=4))
    train(cfg3, ds, ds, workdir)
    _, _, epoch, extra = ckpt.restore("latest", template)
    assert epoch == 3
    assert extra["best_score"] == pytest.approx(0.5)
    assert extra["es_cnt"] == 3
    assert extra["plateau_num_bad"] == 3


def test_tan_optimizer_plateau_reduces_lr():
    """TAN family uses Adam + ReduceLROnPlateau (cone_2dtan train.py:143-147,
    factor 0.8 / patience 20): the injected lr drops by `factor` after
    `patience`+1 evals without improvement, and the smaller lr actually
    shrinks the applied updates."""
    import jax
    import jax.numpy as jnp

    from cone_tpu.train.optim import ReduceLROnPlateau, make_tan_optimizer

    cfg = TrainConfig(lr=1e-3)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = make_tan_optimizer(cfg)
    opt_state = tx.init(params)
    sched = ReduceLROnPlateau(factor=0.8, patience=2)

    # improving scores: lr untouched
    for s in [0.1, 0.2, 0.3]:
        opt_state, lr = sched.step(s, opt_state)
        assert lr == pytest.approx(1e-3)

    # plateau: patience=2 tolerated evals, the 3rd bad eval drops the lr
    for i, s in enumerate([0.3, 0.3, 0.3]):
        opt_state, lr = sched.step(s, opt_state)
    assert lr == pytest.approx(0.8e-3)
    # and again after another full patience window
    for s in [0.3, 0.3, 0.3]:
        opt_state, lr = sched.step(s, opt_state)
    assert lr == pytest.approx(0.64e-3)

    # the injected lr drives the actual update magnitude
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    up_small, _ = tx.update(grads, opt_state, params)
    sched2 = ReduceLROnPlateau()
    opt2 = tx.init(params)
    up_full, _ = tx.update(grads, opt2, params)
    ratio = float(jnp.abs(up_small["w"]).mean() / jnp.abs(up_full["w"]).mean())
    assert ratio == pytest.approx(0.64, rel=1e-3)
