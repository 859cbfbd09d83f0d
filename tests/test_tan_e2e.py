"""CONE-TAN end-to-end: training loss falls; inference pipeline produces
well-formed ranked predictions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.data.dataset import TrainLoader
from cone_tpu.eval.tan_pipeline import TanInferencePipeline
from cone_tpu.models.tan import ConeTanModel, TanConfig
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.tan_step import make_tan_train_step

DIM = 32
NC = 32


@pytest.fixture(scope="module")
def cfgs():
    tan = TanConfig(
        num_clips=NC, hidden_size=48, v_feat_dim=DIM, t_feat_dim=DIM,
        txt_hidden_size=48, lstm_layers=2, num_scale_layers=(8, 4),
        # kernel/padding telescope back to num_clips: 32 +8-4 -> 36 -4 -> 32
        map_hidden_sizes=(48, 48), map_kernel_sizes=(5, 5), map_paddings=(4, 0),
    )
    cone = ConeConfig(
        model=ModelConfig(t_feat_dim=DIM, v_appear_feat_dim=DIM,
                          v_motion_feat_dim=DIM, adapter_module="linear",
                          max_q_l=8, max_v_l=NC),
        data=DataConfig(dset_name="synthetic", max_v_l=NC, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        train=TrainConfig(bsz=8, lr=3e-4),
        eval=EvalConfig(query_chunk=4),
    )
    return cone, tan


@pytest.fixture(scope="module")
def ds(cfgs):
    cone, _ = cfgs
    return make_synthetic_dataset(
        cone.data, n_videos=4, queries_per_video=4, ctx_l_range=(90, 180),
        dim=DIM, signal=3.0, seed=9,
    )


@pytest.fixture(scope="module")
def model_and_params(cfgs):
    _, tan = cfgs
    model = ConeTanModel(tan)
    var = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 8, DIM)), jnp.ones((2, 8)), jnp.zeros((2, NC, DIM)),
        jnp.zeros((2, DIM)), jnp.zeros((2, NC, DIM)),
        method=ConeTanModel.init_all,
    )
    return model, var["params"]


def test_tan_training_loss_falls(cfgs, ds, model_and_params):
    cone, tan = cfgs
    model, params = model_and_params
    params = jax.tree.map(jnp.array, params)  # the step donates its input
    loader = TrainLoader(ds, bsz=cone.train.bsz, seed=0)
    tx = make_optimizer(params, cone.train, loader.steps_per_epoch())
    opt_state = tx.init(params)
    step = make_tan_train_step(model, tx, tan)
    losses, bce = [], []
    rng = jax.random.PRNGKey(0)
    n = 0
    for epoch in range(50):
        for batch in loader.epoch(epoch):
            adapter_on = n >= 24  # exercise both compiled variants
            params, opt_state, m = step(params, opt_state, batch, rng, adapter_on)
            losses.append(float(m["loss_overall"]))
            bce.append(float(m["loss_bce"]))
            n += 1
            if n >= 28:
                break
        if n >= 28:
            break
    assert np.isfinite(losses).all()
    assert np.mean(bce[-4:]) < np.mean(bce[:4]) - 5e-3, bce
    assert "loss_adapter" in m


def test_tan_fused_matches_staged(cfgs, ds, model_and_params):
    cone, tan = cfgs
    model, params = model_and_params
    pipe = TanInferencePipeline(model, params, ds, cone, tan, proposal_top_k=5)
    subs1, rank1 = pipe.run(host_postproc=False)
    subs2, rank2 = pipe.run(host_postproc=False, fused=True)
    assert rank1 == rank2
    by_qid = {r["query_id"]: r for r in subs1["fusion"]}
    for row in subs2["fusion"]:
        got = np.asarray(row["predicted_times"])
        want = np.asarray(by_qid[row["query_id"]]["predicted_times"])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_tan_inference_pipeline(cfgs, ds, model_and_params):
    cone, tan = cfgs
    model, params = model_and_params
    pipe = TanInferencePipeline(model, params, ds, cone, tan, proposal_top_k=5)
    subs, ranklists = pipe.run(host_postproc=True)
    assert set(r["query_id"] for r in subs["fusion"]) == {
        e.query_id for e in ds.examples
    }
    for row in subs["fusion"]:
        times = row["predicted_times"]
        assert 1 <= len(times) <= cone.eval.max_after_nms
        for t in times:
            assert t[0] < t[1] + 1e-6
            assert 0.0 - 1e-6 <= t[2] <= 1.0 + 1e-6  # sigmoid prob


# -------------- TARGET_STRIDE=2 geometry (MAD yaml, scaled down) ----------


@pytest.fixture(scope="module")
def cfgs_s2():
    tan = TanConfig(
        num_clips=NC, hidden_size=48, v_feat_dim=DIM, t_feat_dim=DIM,
        txt_hidden_size=48, lstm_layers=2, num_scale_layers=(8, 4),
        map_hidden_sizes=(48, 48), map_kernel_sizes=(5, 5), map_paddings=(4, 0),
        frame_kernel=2, frame_stride=2,
    )
    cone = ConeConfig(
        model=ModelConfig(t_feat_dim=DIM, v_appear_feat_dim=DIM,
                          v_motion_feat_dim=DIM, adapter_module="linear",
                          max_q_l=8, max_v_l=2 * NC),
        data=DataConfig(dset_name="synthetic", max_v_l=2 * NC, max_q_l=8,
                        clip_length=0.5, topk_window=4, max_ctx_l=512),
        train=TrainConfig(bsz=8, lr=3e-4),
        eval=EvalConfig(query_chunk=4),
    )
    return cone, tan


@pytest.fixture(scope="module")
def ds_s2(cfgs_s2):
    cone, _ = cfgs_s2
    return make_synthetic_dataset(
        cone.data, n_videos=3, queries_per_video=4, ctx_l_range=(180, 400),
        dim=DIM, signal=3.0, seed=11,
    )


@pytest.fixture(scope="module")
def model_and_params_s2(cfgs_s2):
    _, tan = cfgs_s2
    model = ConeTanModel(tan)
    raw = NC * tan.frame_stride
    var = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 8, DIM)), jnp.ones((2, 8)), jnp.zeros((2, raw, DIM)),
        jnp.zeros((2, DIM)), jnp.zeros((2, raw, DIM)),
        method=ConeTanModel.init_all,
    )
    return model, var["params"]


def test_tan_stride2_training_loss_falls(cfgs_s2, ds_s2, model_and_params_s2):
    cone, tan = cfgs_s2
    model, params = model_and_params_s2
    params = jax.tree.map(jnp.array, params)
    loader = TrainLoader(ds_s2, bsz=cone.train.bsz, seed=0)
    tx = make_optimizer(params, cone.train, loader.steps_per_epoch())
    opt_state = tx.init(params)
    step = make_tan_train_step(model, tx, tan)
    bce = []
    rng = jax.random.PRNGKey(0)
    n = 0
    for epoch in range(50):
        for batch in loader.epoch(epoch):
            assert batch["pos_motion"].shape[1] == 2 * NC  # raw window
            params, opt_state, m = step(params, opt_state, batch, rng, False)
            bce.append(float(m["loss_bce"]))
            n += 1
            if n >= 32:
                break
        if n >= 32:
            break
    assert np.isfinite(bce).all()
    assert np.mean(bce[-4:]) < np.mean(bce[:4]) - 5e-3, bce


def test_tan_stride2_pipeline(cfgs_s2, ds_s2, model_and_params_s2):
    """Inference at MAD stride-2 geometry: raw 2*NC windows, 64x64-equivalent
    map, spans decoded x TARGET_STRIDE; host == fused."""
    cone, tan = cfgs_s2
    model, params = model_and_params_s2
    pipe = TanInferencePipeline(model, params, ds_s2, cone, tan,
                                proposal_top_k=5)
    # staged device postproc as the comparison base: with random untrained
    # weights, overlapping windows emit duplicate spans where the host's
    # dict-dedup (last-wins) and device NMS (max-wins) legitimately differ;
    # host==device equivalence is pinned on converted weights in
    # test_e2e_inference_parity.py.
    subs, ranklists = pipe.run(host_postproc=False)
    fsubs, frank = pipe.run(host_postproc=False, fused=True)
    assert frank == ranklists
    for row in subs["fusion"]:
        ex = next(e for e in ds_s2.examples if e.query_id == row["query_id"])
        ctx_l = len(ds_s2.video_features(ex.clip_id)[0])
        for t in row["predicted_times"]:
            assert t[0] < t[1] + 1e-6
            # spans decode to raw-clip units * clip_length, within the video
            assert -1e-6 <= t[0] and t[1] <= (ctx_l + 1) * cone.data.clip_length
            # cell boundaries are multiples of TARGET_STRIDE in window-local
            # clip units; window starts are multiples of the window stride
            local = round(t[0] / cone.data.clip_length) % tan.frame_stride
            assert local == 0
    by_qid = {r["query_id"]: r for r in subs["fusion"]}
    for row in fsubs["fusion"]:
        got = np.asarray([t[:2] for t in row["predicted_times"]])
        want = np.asarray([t[:2] for t in by_qid[row["query_id"]]["predicted_times"]])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_tan_sharded_step_matches_unsharded(cfgs, ds):
    """The TAN train step's DP sharding (the TPU-native counterpart of the
    reference stack's ONLY parallelism, cone_2dtan torch.nn.DataParallel,
    moment_localization/train.py:133-135): sharded over the 8-device mesh
    == single-device, same losses."""
    from cone_tpu.parallel.mesh import make_mesh, shard_batch
    from cone_tpu.train.optim import make_tan_optimizer

    cone, tan = cfgs

    def run(mesh, n_steps=4):
        model = ConeTanModel(tan)
        var = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, 8, DIM)), jnp.ones((2, 8)), jnp.zeros((2, NC, DIM)),
            jnp.zeros((2, DIM)), jnp.zeros((2, NC, DIM)),
            method=ConeTanModel.init_all,
        )
        params = jax.tree.map(jnp.array, var["params"])
        loader = TrainLoader(ds, bsz=cone.train.bsz, seed=0)
        tx = make_tan_optimizer(cone.train)
        opt_state = tx.init(params)
        step = make_tan_train_step(model, tx, tan, mesh=mesh)
        rng = jax.random.PRNGKey(0)
        losses = []
        for batch in loader.epoch(0):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            params, opt_state, m = step(params, opt_state, batch, rng, False)
            losses.append(float(m["loss_overall"]))
            if len(losses) >= n_steps:
                break
        return losses

    l1 = run(None)
    l2 = run(make_mesh(8))
    assert np.isfinite(l1).all()
    np.testing.assert_allclose(l1, l2, rtol=2e-4)
