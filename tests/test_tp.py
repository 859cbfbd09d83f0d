"""Tensor-parallel (dp x tp mesh) training: parity vs pure DP.

The tp axis Megatron-shards the DETR transformer's matmul params
(parallel/mesh.param_shardings); GSPMD inserts the per-layer all-reduces.
Correctness bar: the tp step must reproduce the pure-DP step's entire
metric trajectory (same batches, same rng) to fp32 tolerance — partitioned
matmuls only reorder reductions, they must not change the math.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cone_tpu.config import ConeConfig, DataConfig, ModelConfig, TrainConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.data.dataset import TrainLoader
from cone_tpu.models.init import build_model_and_params
from cone_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
    tp_size,
)
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step


def _tiny_cfg(bsz=8):
    dim = 32
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=dim, v_motion_feat_dim=dim, v_appear_feat_dim=dim,
            max_q_l=8, max_v_l=32,
        ),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0, max_windows=5),
        train=TrainConfig(bsz=bsz),
    )


def _run_steps(cfg, mesh, n_steps=3):
    """Fresh params/optimizer, fixed seeds, n_steps on the given mesh;
    returns (metric dicts per step, final params on host)."""
    ds = make_synthetic_dataset(
        cfg.data, n_videos=2, queries_per_video=16, ctx_l_range=(80, 120),
        dim=cfg.model.t_feat_dim, seed=0,
    )
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=cfg.train.bsz, seed=0)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    if tp_size(mesh) > 1:
        params = shard_params(params, mesh)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    out = []
    it = iter(loader.epoch(0))
    for _ in range(n_steps):
        batch = shard_batch(next(it), mesh)
        rng, sub = jax.random.split(rng)
        # deterministic=False path with identical rng keys: threefry dropout
        # masks are bit-stable across shardings, so the trajectories compare
        params, opt_state, metrics = step(params, opt_state, batch, sub, True)
        out.append({k: float(v) for k, v in jax.device_get(metrics).items()})
    return out, jax.device_get(params)


def test_tp_step_matches_dp():
    cfg = _tiny_cfg()
    dp_metrics, dp_params = _run_steps(cfg, make_mesh(8))
    tp_metrics, tp_params = _run_steps(cfg, make_mesh(8, tp=4))
    assert len(dp_metrics) == len(tp_metrics) == 3
    for s, (a, b) in enumerate(zip(dp_metrics, tp_metrics)):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], rtol=2e-4, atol=1e-5,
                err_msg=f"step {s} metric {k}")
    leaves_a = jax.tree.leaves(dp_params)
    leaves_b = jax.tree.leaves(tp_params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(la, lb, rtol=2e-4, atol=1e-5)


def test_param_shardings_rules():
    cfg = _tiny_cfg()
    _, params = build_model_and_params(cfg.model, seed=0)
    mesh = make_mesh(8, tp=4)
    sh = param_shardings(params, mesh)

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    n_col = sum(1 for p, s in flat.items()
                if p.endswith("in_proj/kernel") and s.spec == P(None, "tp"))
    n_row = sum(1 for p, s in flat.items()
                if p.endswith("out_proj/kernel") and s.spec == P("tp", None))
    n_ffn1 = sum(1 for p, s in flat.items()
                 if p.endswith("linear1/kernel") and s.spec == P(None, "tp"))
    # 2 encoder layers (1 attn) + 2 decoder layers (2 attn) = 6 attention
    # blocks; 4 transformer FFNs
    assert n_col == 6 and n_row == 6 and n_ffn1 == 4
    # LayerNorms / heads / embeddings stay replicated
    for p, s in flat.items():
        if "norm" in p or "class_embed" in p:
            assert s.spec == P(), p


def test_params_stay_sharded_across_steps():
    cfg = _tiny_cfg()
    mesh = make_mesh(8, tp=2)
    ds = make_synthetic_dataset(
        cfg.data, n_videos=2, queries_per_video=8, ctx_l_range=(80, 120),
        dim=cfg.model.t_feat_dim, seed=0,
    )
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=cfg.train.bsz, seed=0)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    params = shard_params(params, mesh)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    batch = shard_batch(next(iter(loader.epoch(0))), mesh)
    params, opt_state, _ = step(params, opt_state, batch,
                                jax.random.PRNGKey(0), False)
    k = params["transformer"]["encoder_layer_0"]["self_attn"]["in_proj"]["kernel"]
    assert k.sharding.spec == P(None, "tp"), k.sharding
    # the optimizer moments mirror the param layout (no replicated copies)
    mus = [l for l in jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, opt_state,
                     is_leaf=lambda x: hasattr(x, "sharding")))]
    assert P(None, "tp") in mus


def test_divisibility_fallback_replicates():
    mesh = make_mesh(8, tp=4)
    fake = {"blk": {"linear1": {"kernel": np.ones((4, 6), np.float32),
                                "bias": np.ones((6,), np.float32)}}}
    sh = param_shardings(fake, mesh)
    # 6 % 4 != 0 -> both leaves silently replicate
    assert sh["blk"]["linear1"]["kernel"].spec == P()
    assert sh["blk"]["linear1"]["bias"].spec == P()


@pytest.mark.slow
def test_train_loop_with_tp_e2e(tmp_path):
    """Full train() with train.tp_devices=2: steps, eval (mesh flattens back
    to 8-way DP), criterion eval losses, checkpoint save/restore round trip."""
    from cone_tpu.train.loop import train

    import dataclasses

    cfg = _tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, tp_devices=2, n_epoch=2, eval_epoch_interval=1, debug=True))
    ds = make_synthetic_dataset(
        cfg.data, n_videos=2, queries_per_video=8, ctx_l_range=(80, 120),
        dim=cfg.model.t_feat_dim, seed=0,
    )
    mesh = make_mesh(8, tp=cfg.train.tp_devices)
    params, history = train(cfg, ds, ds, str(tmp_path), mesh=mesh)
    assert len(history) == 2
    assert all(np.isfinite(h["loss_overall"]) for h in history)
    # resume restores into the sharded layout and keeps training
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, n_epoch=3))
    params, history = train(cfg, ds, ds, str(tmp_path), mesh=mesh)
    assert history[-1]["epoch"] == 3
