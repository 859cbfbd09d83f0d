"""Determinism: identical seeds -> identical training trajectories and
identical inference outputs (the reference's set_seed contract,
cone/train.py:27-32, made testable)."""

import jax
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.data.dataset import TrainLoader
from cone_tpu.models.init import build_model_and_params
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0),
        train=TrainConfig(bsz=8, seed=7),
    )


def _train_losses(cfg, n_steps=5):
    ds = make_synthetic_dataset(cfg.data, n_videos=3, queries_per_video=4,
                                ctx_l_range=(80, 150), dim=DIM, seed=2)
    model, params = build_model_and_params(cfg.model, seed=cfg.train.seed)
    loader = TrainLoader(ds, bsz=cfg.train.bsz, seed=cfg.train.seed)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    losses = []
    n = 0
    for epoch in range(10):
        for batch in loader.epoch(epoch):
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, batch, sub, False)
            losses.append(float(m["loss_overall"]))
            n += 1
            if n >= n_steps:
                return losses
    return losses


def test_same_seed_same_trajectory(cfg):
    a = _train_losses(cfg)
    b = _train_losses(cfg)
    np.testing.assert_array_equal(a, b)


def test_loader_epochs_differ_but_are_reproducible(cfg):
    ds = make_synthetic_dataset(cfg.data, n_videos=3, queries_per_video=4,
                                ctx_l_range=(80, 150), dim=DIM, seed=2)
    l1 = TrainLoader(ds, bsz=4, seed=1)
    e0a = next(iter(l1.epoch(0)))
    e1 = next(iter(l1.epoch(1)))
    e0b = next(iter(TrainLoader(ds, bsz=4, seed=1).epoch(0)))
    np.testing.assert_array_equal(e0a["pos_motion"], e0b["pos_motion"])
    assert not np.array_equal(e0a["pos_motion"], e1["pos_motion"])
