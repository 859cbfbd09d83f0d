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


# ---------------- TARGET_STRIDE=2 (MAD yaml) geometry --------------------

GOLDEN_S2 = os.path.join(os.path.dirname(__file__), "golden",
                         "tan_forward_stride2.npz")


@pytest.fixture(scope="module")
def golden_s2():
    if not os.path.exists(GOLDEN_S2):
        pytest.skip("no stride-2 golden fixture")
    return dict(np.load(GOLDEN_S2).items())


@pytest.fixture(scope="module")
def cfg_s2():
    # MAD yaml geometry: NUM_SAMPLE_CLIPS=128, TARGET_STRIDE=2 -> 64x64 map
    return TanConfig(
        num_clips=64, hidden_size=64, v_feat_dim=64, t_feat_dim=48,
        txt_hidden_size=64, map_hidden_sizes=(64, 64, 64, 64),
        frame_kernel=2, frame_stride=2, adapter_module="none",
    )


def test_forward_parity_stride2(golden_s2, cfg_s2):
    """Raw 128-clip window through stride-2 frame pooling bit-matches the
    reference chain (experiments/mad yaml FRAME_MODULE KERNEL/STRIDE 2)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_tan_ckpt import tan_state_dict_to_params

    blob = {k[3:]: v for k, v in golden_s2.items() if k.startswith("w::")}
    params = tan_state_dict_to_params(blob)
    model = ConeTanModel(cfg_s2)
    scores, map_mask = model.apply(
        {"params": params},
        jnp.asarray(golden_s2["tok"]), jnp.asarray(golden_s2["tok_mask"]),
        jnp.asarray(golden_s2["vis"]),  # (B, 128, D) raw window
    )
    np.testing.assert_array_equal(np.asarray(map_mask), golden_s2["map_mask"])
    np.testing.assert_allclose(np.asarray(scores), golden_s2["scores"],
                               atol=3e-4)


def test_decode_stride2(golden_s2, cfg_s2):
    """Cell -> seconds decode multiplies by TARGET_STRIDE before adding the
    window start (moment_localization/test.py:293-297)."""
    sc = golden_s2["scores"]
    mm = golden_s2["map_mask"]
    stride = cfg_s2.frame_stride
    clip_len = float(golden_s2["clip_len"])
    vstart = int(golden_s2["video_start"])
    for i in range(sc.shape[0]):
        masked = np.where(mm > 0, sc[i], -np.inf)
        s_idx, e_idx = np.unravel_index(np.argmax(masked), masked.shape)
        got = (np.array([s_idx, e_idx + 1]) * stride + vstart) * clip_len
        np.testing.assert_allclose(got, golden_s2["decoded_top1"][i],
                                   atol=1e-5)
