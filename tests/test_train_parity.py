"""Training-DYNAMICS parity: N full optimizer steps vs the torch reference.

The fixture (tests/golden/train_trajectory.npz, tools/gen_golden_train.py)
holds the reference's per-step total loss / criterion terms / pre-clip grad
norm and the final weights after 4 steps of its real training recipe
(cone/train.py:53-89 + the grouped AdamW of cone/inference.py:511-523,
dropout disabled). Replaying the same batch through make_train_step +
make_optimizer from the converted initial weights must reproduce the whole
trajectory — this pins backward-pass gradients, global-norm clipping, the
two lr groups, decoupled weight decay and Adam bias correction end-to-end,
the strongest no-real-data statement that *training* (not just the forward
pass) matches the reference.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, LossConfig, ModelConfig, TrainConfig
from cone_tpu.models.cone import ConeModel
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "train_trajectory.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                reason="no golden fixture")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN).items())


@pytest.fixture(scope="module")
def trajectory(golden):
    """Run the reference's 4-step recipe through our train step; return
    (per-step metrics, final params)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_ckpt import torch_state_dict_to_params

    g = golden
    mcfg = ModelConfig(
        t_feat_dim=36, v_motion_feat_dim=40, v_appear_feat_dim=36,
        hidden_dim=256, nheads=8, enc_layers=2, dec_layers=2,
        dim_feedforward=1024, max_q_l=20, max_v_l=20,
        dropout=0.0, input_dropout=0.0,
    )
    tcfg = TrainConfig(
        lr=float(g["lr"]), coef_lr=float(g["coef_lr"]), wd=float(g["wd"]),
        grad_clip=float(g["grad_clip"]), lr_drop=120,
    )
    cfg = ConeConfig(model=mcfg, loss=LossConfig(), train=tcfg)

    params = torch_state_dict_to_params(
        {k[len("w0::"):]: v for k, v in g.items() if k.startswith("w0::")},
        mcfg)
    model = ConeModel(mcfg)
    # lr_drop=120 epochs x 10_000 steps/epoch >> 4 steps: constant lr, like
    # the reference's StepLR inside epoch 0
    tx = make_optimizer(params, tcfg, steps_per_epoch=10_000)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)

    batch = {
        "query_tokens": jnp.asarray(g["src_txt"]),
        "query_mask": jnp.asarray(g["src_txt_mask"]),
        "pos_motion": jnp.asarray(g["src_vid"]),
        "pos_mask": jnp.asarray(g["src_vid_mask"]),
        "neg_motion": jnp.asarray(g["neg_vid"]),
        "neg_mask": jnp.asarray(g["neg_mask"]),
        "query_cls": jnp.asarray(g["cls_txt"]),
        "pos_appear": jnp.asarray(g["vid_appear"]),
        "prop_start": jnp.asarray(g["prop_start"]),
        "prop_end": jnp.asarray(g["prop_end"]),
        "span_labels": jnp.asarray(g["tgt_spans"]),
        "span_mask": jnp.ones(g["tgt_spans"].shape[:2], jnp.float32),
        "sal_pos": jnp.asarray(g["sal_pos"]),
        "sal_neg": jnp.asarray(g["sal_neg"]),
    }
    steps = []
    rng = jax.random.PRNGKey(0)  # dropout rates are 0.0 — rng is inert
    for _ in range(int(g["n_steps"])):
        params, opt_state, m = step(params, opt_state, batch, rng, True)
        steps.append({k: float(v) for k, v in m.items()})
    return steps, jax.device_get(params)


def test_per_step_losses_match(golden, trajectory):
    steps, _ = trajectory
    for i, m in enumerate(steps):
        ref = float(golden[f"step{i}_loss_overall"])
        assert abs(m["loss_overall"] - ref) < 2e-3 * max(1.0, abs(ref)), (
            i, m["loss_overall"], ref)


def test_per_step_grad_norms_match(golden, trajectory):
    """The pre-clip global gradient norm — if backward-pass gradients match,
    so does this; it also witnesses that clipping engaged (norm >> 0.1)."""
    steps, _ = trajectory
    for i, m in enumerate(steps):
        ref = float(golden[f"step{i}_grad_norm"])
        assert ref > 10 * float(golden["grad_clip"])  # clip path exercised
        assert abs(m["grad_norm"] - ref) < 2e-3 * ref, (
            i, m["grad_norm"], ref)


def test_per_step_criterion_terms_match(golden, trajectory):
    steps, _ = trajectory
    for i, m in enumerate(steps):
        for key in ["loss_span", "loss_giou", "loss_label", "loss_saliency",
                    "loss_adapter", "loss_span_0", "loss_giou_0",
                    "loss_label_0"]:
            ref = float(golden[f"step{i}_{key}"])
            assert abs(m[key] - ref) < 3e-3 * max(1.0, abs(ref)), (
                i, key, m[key], ref)


def test_loss_actually_falls(golden):
    """Sanity on the fixture itself: the recipe trains."""
    first = float(golden["step0_loss_overall"])
    last = float(golden[f"step{int(golden['n_steps']) - 1}_loss_overall"])
    assert last < first


def test_final_params_match(golden, trajectory):
    """After 4 AdamW updates, every parameter matches the reference's final
    state dict (converted). Per-step updates are O(lr=1e-4); agreement here
    means gradients, clip scaling, both lr groups and weight decay all
    matched at every step."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_ckpt import torch_state_dict_to_params

    ref_final = torch_state_dict_to_params(
        {k[len("w::"):]: v for k, v in golden.items()
         if k.startswith("w::")},
        ModelConfig(t_feat_dim=36, v_motion_feat_dim=40, v_appear_feat_dim=36,
                    hidden_dim=256, nheads=8, enc_layers=2, dec_layers=2,
                    dim_feedforward=1024, max_q_l=20, max_v_l=20))
    _, got_final = trajectory

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_final)
    flat_got = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(got_final))
    assert len(flat_ref) == len(flat_got)
    worst = ("", 0.0)
    for path, ref_leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        diff = float(np.max(np.abs(flat_got[key] - np.asarray(ref_leaf))))
        if diff > worst[1]:
            worst = (key, diff)
        assert diff < 5e-4, (key, diff)
    # the typical case should be far tighter than the assert bound
    print(f"worst param diff: {worst[0]} {worst[1]:.2e}")
