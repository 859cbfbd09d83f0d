"""Criterion parity with MULTIPLE (ragged) target spans per sample."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.config import LossConfig, ModelConfig
from cone_tpu.models.cone import ConeModel
from cone_tpu.models.losses import compute_losses

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cone_multispan.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no fixture")


def test_multispan_criterion_parity():
    g = dict(np.load(GOLDEN).items())
    cfg = ModelConfig(
        t_feat_dim=36, v_motion_feat_dim=40, v_appear_feat_dim=36,
        max_q_l=20, max_v_l=20,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_ckpt import torch_state_dict_to_params

    sd = {k[3:]: v for k, v in g.items() if k.startswith("w::")}
    model = ConeModel(cfg)
    out = model.apply(
        {"params": torch_state_dict_to_params(sd, cfg)},
        jnp.asarray(g["src_txt"]), jnp.asarray(g["src_txt_mask"]),
        jnp.asarray(g["src_vid"]), jnp.asarray(g["src_vid_mask"]),
        deterministic=True,
    )
    targets = {
        "span_labels": jnp.asarray(g["tgt_spans"]),
        "span_mask": jnp.asarray(g["span_mask"]),
        "saliency_pos": jnp.asarray(g["sal_pos"]),
        "saliency_neg": jnp.asarray(g["sal_neg"]),
    }
    losses = compute_losses(out, targets, None, LossConfig())
    for key in ["loss_span", "loss_giou", "loss_label", "loss_saliency",
                "loss_span_0", "loss_giou_0", "loss_label_0"]:
        got, ref = float(losses[key]), float(g[f"loss_{key}"])
        assert abs(got - ref) < 5e-4, (key, got, ref)


def test_giou_finite_with_degenerate_pred_on_padded_slot():
    """A sigmoid width that underflows to exactly 0, matched against a
    PADDED (0,0) target slot, used to make gIoU 0/0 = NaN and poison the
    whole loss (and its gradient) despite the mask (losses.py safe_tgt)."""
    import jax
    import jax.numpy as jnp

    from cone_tpu.config import LossConfig
    from cone_tpu.models.losses import compute_losses

    nq, nt = 5, 3
    outputs = {
        "pred_spans": jnp.zeros((1, nq, 2)),       # all-degenerate (0, 0)
        "pred_logits": jnp.zeros((1, nq, 2)),
        "saliency_scores": jnp.zeros((1, 8)),
        "aux_outputs": [],
    }
    targets = {
        "span_labels": jnp.asarray([[[0.5, 0.4], [0.0, 0.0], [0.0, 0.0]]]),
        "span_mask": jnp.asarray([[1.0, 0.0, 0.0]]),  # 2 padded slots
        "saliency_pos": jnp.zeros((1, 2), jnp.int32),
        "saliency_neg": jnp.ones((1, 2), jnp.int32),
    }
    losses = compute_losses(outputs, targets, None, LossConfig())
    assert np.isfinite(float(losses["loss_giou"]))

    def f(spans):
        out = dict(outputs, pred_spans=spans)
        return compute_losses(out, targets, None, LossConfig())["loss_giou"]

    g = jax.grad(f)(outputs["pred_spans"])
    assert np.isfinite(np.asarray(g)).all()


def test_video_cache_bound(tmp_path):
    """data.max_cached_videos caps the host feature cache (FIFO)."""
    import dataclasses

    from cone_tpu.config import DataConfig
    from cone_tpu.data import make_synthetic_dataset

    cfg = dataclasses.replace(
        DataConfig(max_v_l=16, max_q_l=4, max_ctx_l=128), max_cached_videos=2)
    ds = make_synthetic_dataset(cfg, n_videos=5, queries_per_video=1,
                                ctx_l_range=(40, 60), dim=8, seed=0)
    a0 = ds.video_features(ds.video_ids[0])[0]
    for cid in ds.video_ids:
        ds.video_features(cid)
    assert len(ds._vid_cache) <= 2
    np.testing.assert_array_equal(ds.video_features(ds.video_ids[0])[0], a0)
