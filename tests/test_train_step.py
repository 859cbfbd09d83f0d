"""Train step: compiles, runs, loss decreases on synthetic data; the
DP-sharded variant runs on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, LossConfig, ModelConfig, TrainConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.data.dataset import TrainLoader
from cone_tpu.models.init import build_model_and_params
from cone_tpu.parallel.mesh import make_mesh, shard_batch
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32,
        ),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0),
        train=TrainConfig(bsz=8, lr=3e-4),
    )


@pytest.fixture(scope="module")
def ds(cfg):
    return make_synthetic_dataset(
        cfg.data, n_videos=4, queries_per_video=4, ctx_l_range=(80, 150),
        dim=DIM, seed=11,
    )


def _run_steps(cfg, ds, mesh, n_steps=16, adapter_on=False):
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=cfg.train.bsz, seed=1)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    rng = jax.random.PRNGKey(0)

    losses = []
    it = 0
    for epoch in range(100):
        for batch in loader.epoch(epoch):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = step(
                params, opt_state, batch, sub, adapter_on
            )
            losses.append(float(metrics["loss_overall"]))
            it += 1
            if it >= n_steps:
                return losses, metrics
    return losses, metrics


def test_loss_decreases_single_device(cfg, ds):
    losses, metrics = _run_steps(cfg, ds, mesh=None, n_steps=20)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.9, losses
    for k in ["loss_span", "loss_giou", "loss_label", "loss_saliency"]:
        assert k in metrics


def test_adapter_branch_runs(cfg, ds):
    losses, metrics = _run_steps(cfg, ds, mesh=None, n_steps=3, adapter_on=True)
    assert "loss_adapter" in metrics
    assert np.isfinite(losses).all()


def test_sharded_step_8_devices(cfg, ds):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    losses, _ = _run_steps(cfg, ds, mesh=mesh, n_steps=6)
    assert np.isfinite(losses).all()


def test_sharded_matches_unsharded(cfg, ds):
    l1, _ = _run_steps(cfg, ds, mesh=None, n_steps=4)
    l2, _ = _run_steps(cfg, ds, mesh=make_mesh(8), n_steps=4)
    np.testing.assert_allclose(l1, l2, rtol=2e-4)
