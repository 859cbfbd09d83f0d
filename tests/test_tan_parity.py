"""Golden parity: flax ConeTanModel vs the reference 2D-TAN modules
(fixture from tools/gen_golden_tan.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.models.tan import (
    ConeTanModel,
    TanConfig,
    bce_rescale_loss,
    iou_target_map,
    sparse_map_mask,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tan_forward.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden fixture")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN).items())


@pytest.fixture(scope="module")
def cfg():
    return TanConfig(
        num_clips=64, hidden_size=64, v_feat_dim=64, t_feat_dim=48,
        txt_hidden_size=64, map_hidden_sizes=(64, 64, 64, 64),
    )


@pytest.fixture(scope="module")
def model_and_params(golden, cfg):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_tan_ckpt import tan_state_dict_to_params

    blob = {k[3:]: v for k, v in golden.items() if k.startswith("w::")}
    params = tan_state_dict_to_params(blob)
    return ConeTanModel(cfg), {"params": params}


def test_sparse_map_mask_matches(golden, cfg):
    got = sparse_map_mask(cfg.num_clips, cfg.num_scale_layers)
    np.testing.assert_array_equal(got, golden["map_mask"])


def test_forward_parity(golden, model_and_params):
    model, variables = model_and_params
    scores, map_mask = model.apply(
        variables,
        jnp.asarray(golden["tok"]), jnp.asarray(golden["tok_mask"]),
        jnp.asarray(golden["vis"]),
    )
    np.testing.assert_array_equal(np.asarray(map_mask), golden["map_mask"])
    np.testing.assert_allclose(np.asarray(scores), golden["scores"], atol=3e-4)


def test_iou_target_map_matches(golden):
    gts = [(3.2, 17.9), (40.0, 63.5), (0.0, 5.0)]
    for i, (s, e) in enumerate(gts):
        got = iou_target_map(64, s, e)
        np.testing.assert_allclose(got, golden["targets"][i], atol=1e-6)


def test_bce_rescale_loss_parity(golden):
    loss, _ = bce_rescale_loss(
        jnp.asarray(golden["scores"]), jnp.asarray(golden["map_mask"]),
        jnp.asarray(golden["targets"]),
    )
    assert abs(float(loss) - float(golden["loss"])) < 2e-5
