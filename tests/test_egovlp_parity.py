"""EgoVLP video tower (flax) vs the reference SpaceTimeTransformer."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.models.egovlp import EgoVlpConfig, EgoVlpVideoTower

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "egovlp_tower.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no fixture")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN).items())


def test_tower_parity(golden):
    img, patch, dim, depth, heads, frames, proj = golden["cfg"].tolist()
    cfg = EgoVlpConfig(img_size=img, patch_size=patch, embed_dim=dim,
                       depth=depth, num_heads=heads, num_frames=frames,
                       projection_dim=proj)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_egovlp_ckpt import egovlp_state_dict_to_params

    sd = {k[3:]: v for k, v in golden.items() if k.startswith("w::")}
    params = egovlp_state_dict_to_params(sd, depth=depth)

    model = EgoVlpVideoTower(cfg)
    # torch layout (B, F, C, H, W) -> flax (B, F, H, W, C)
    frames_np = golden["frames"].transpose(0, 1, 3, 4, 2)
    out = model.apply({"params": params}, jnp.asarray(frames_np))
    np.testing.assert_allclose(np.asarray(out), golden["projected"], atol=2e-4)
