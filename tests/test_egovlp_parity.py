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


def _tiny_cfg_and_sd(golden):
    img, patch, dim, depth, heads, frames, proj = golden["cfg"].tolist()
    cfg = EgoVlpConfig(img_size=img, patch_size=patch, embed_dim=dim,
                       depth=depth, num_heads=heads, num_frames=frames,
                       projection_dim=proj)
    sd = {k[3:]: v for k, v in golden.items() if k.startswith("w::")}
    return cfg, sd


def test_inflate_truncate_more_frames(golden):
    """Checkpoint with MORE frames than the tower: extra rows are dropped
    (egovlp/model.py:147-150) and the forward is bit-identical to loading
    the un-padded checkpoint — checked against the committed golden."""
    from cone_tpu.models.egovlp import egovlp_state_dict_to_params

    cfg, sd = _tiny_cfg_and_sd(golden)
    key = "video_model.temporal_embed"
    garbage = np.full((1, 3, cfg.embed_dim), 7.25, np.float32)
    sd_more = dict(sd)
    sd_more[key] = np.concatenate([sd[key], garbage], axis=1)

    params = egovlp_state_dict_to_params(sd_more, depth=cfg.depth,
                                         num_frames=cfg.num_frames)
    np.testing.assert_array_equal(
        params["video_model"]["temporal_embed"], sd[key])

    frames_np = golden["frames"].transpose(0, 1, 3, 4, 2)
    out = EgoVlpVideoTower(cfg).apply({"params": params},
                                      jnp.asarray(frames_np))
    np.testing.assert_allclose(np.asarray(out), golden["projected"],
                               atol=2e-4)


def test_inflate_zeros_fewer_frames(golden):
    """Checkpoint with FEWER frames + fix='zeros' (the reference default):
    loaded rows copied, the rest zero (egovlp/model.py:154-156)."""
    from cone_tpu.models.egovlp import egovlp_state_dict_to_params

    cfg, sd = _tiny_cfg_and_sd(golden)
    key = "video_model.temporal_embed"
    sd_fewer = dict(sd)
    sd_fewer[key] = sd[key][:, :1]

    params = egovlp_state_dict_to_params(sd_fewer, depth=cfg.depth,
                                         num_frames=cfg.num_frames,
                                         load_temporal_fix="zeros")
    te = params["video_model"]["temporal_embed"]
    assert te.shape == (1, cfg.num_frames, cfg.embed_dim)
    np.testing.assert_array_equal(te[:, :1], sd[key][:, :1])
    np.testing.assert_array_equal(te[:, 1:], 0.0)


def test_inflate_bilinear_matches_torch():
    """fix='bilinear' must reproduce torch F.interpolate(...,
    mode='bilinear', align_corners=True) — the op the reference calls
    (egovlp/model.py:157-166) — on random embeds, both upsample factors."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from cone_tpu.models.egovlp import inflate_temporal_embed

    rng = np.random.default_rng(0)
    for f_ckpt, f_new in [(4, 7), (2, 16), (3, 4)]:
        emb = rng.standard_normal((1, f_ckpt, 24)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(emb).unsqueeze(0),
                             (f_new, 24), mode="bilinear",
                             align_corners=True).squeeze(0).numpy()
        got = inflate_temporal_embed(emb, f_new, "bilinear")
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_inflate_interp_raises():
    """The reference's 'interp' branch passes align_corners=True with
    mode='nearest', which torch itself rejects — surface the same failure."""
    from cone_tpu.models.egovlp import inflate_temporal_embed

    emb = np.zeros((1, 2, 8), np.float32)
    with pytest.raises(ValueError, match="interp"):
        inflate_temporal_embed(emb, 4, "interp")


def test_spatial_mismatch_raises(golden):
    """pos_embed token-count mismatch raises NotImplementedError like the
    reference guard (egovlp/model.py:172-178)."""
    from cone_tpu.models.egovlp import egovlp_state_dict_to_params

    cfg, sd = _tiny_cfg_and_sd(golden)
    n_tokens = sd["video_model.pos_embed"].shape[1]
    with pytest.raises(NotImplementedError, match="spatial"):
        egovlp_state_dict_to_params(sd, depth=cfg.depth,
                                    num_patches=n_tokens + 5)


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
