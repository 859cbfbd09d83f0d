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
    losses = compute_losses(out, targets, None, LossConfig(), num_queries=5)
    for key in ["loss_span", "loss_giou", "loss_label", "loss_saliency",
                "loss_span_0", "loss_giou_0", "loss_label_0"]:
        got, ref = float(losses[key]), float(g[f"loss_{key}"])
        assert abs(got - ref) < 5e-4, (key, got, ref)
