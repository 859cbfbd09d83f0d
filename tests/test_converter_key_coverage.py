"""Converter key-coverage against the LIVE reference state dicts (slow).

The tiny golden fixtures pin the *math*; what they cannot see is a converter
silently dropping or missing a parameter of the real, full-size models. These
tests build the reference's actual models from /root/reference, take
`state_dict().keys()`, and assert each converter consumes EVERY key and the
converted tree matches the flax model's parameter structure exactly — so any
reference param the converters miss becomes a test failure here instead of a
silent drop at real-checkpoint time.

Covers: cone build_model (both directions of the bidirectional converter,
plus the use_txt_pos variant), CONE_TAN from the shipped experiment yaml
(incl. DataParallel prefixes and the SparsePropConv variant), and the
full-size FrozenInTime ViT-B/16 video tower. Skipped without the reference.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout"),
]

sys.path.insert(0, TOOLS)


class TrackingDict(dict):
    """Records every key the converter reads."""

    def __init__(self, data):
        super().__init__(data)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _shapes(tree, prefix=""):
    """Flatten a param tree to {path: shape}."""
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


@pytest.fixture(scope="module")
def ref_cone():
    sys.path.insert(0, REF)
    sys.path.insert(0, TOOLS)
    import torch  # noqa: F401

    from gen_golden import build_args

    from cone.model import build_model

    return build_args, build_model


def test_cone_converter_covers_every_key(ref_cone):
    """torch_state_dict_to_params reads every reference tensor, and
    params_to_torch_state_dict reproduces the exact key set with bitwise
    values (cone/model.py:468-521 geometry)."""
    from convert_ckpt import params_to_torch_state_dict, torch_state_dict_to_params

    from cone_tpu.config import ModelConfig

    build_args, build_model = ref_cone
    for use_txt_pos in (False, True):
        margs = build_args(use_txt_pos=use_txt_pos, max_q_l=20)
        model, _ = build_model(margs)
        sd = TrackingDict(_sd_numpy(model))
        cfg = ModelConfig(
            t_feat_dim=margs.t_feat_dim,
            v_motion_feat_dim=margs.v_motion_feat_dim,
            v_appear_feat_dim=margs.v_appear_feat_dim,
            use_txt_pos=use_txt_pos, max_q_l=20,
        )
        params = torch_state_dict_to_params(sd, cfg)
        unread = set(sd) - sd.read
        assert not unread, f"converter never read: {sorted(unread)}"

        back = params_to_torch_state_dict(params, cfg)
        assert set(back) == set(sd), (
            f"inverse emits {sorted(set(back) ^ set(sd))} asymmetrically")
        for k in sd:
            ref_val = dict.__getitem__(sd, k)
            if not use_txt_pos and k.startswith("txt_position_embed."):
                # consumed-and-dropped on import, synthesized at fresh-init
                # values on export (unused in forward; reference strict-load
                # just needs the tensors present at the right shapes)
                assert back[k].shape == ref_val.shape, k
                continue
            np.testing.assert_array_equal(back[k], ref_val, err_msg=k)


def test_cone_converted_tree_matches_flax_structure(ref_cone):
    """The converted tree is exactly the flax ConeModel's parameter
    structure — same paths, same shapes, nothing extra or missing."""
    import jax

    from convert_ckpt import torch_state_dict_to_params

    from cone_tpu.config import ModelConfig
    from cone_tpu.models.init import build_model_and_params

    build_args, build_model = ref_cone
    margs = build_args()
    model, _ = build_model(margs)
    cfg = ModelConfig(
        t_feat_dim=margs.t_feat_dim,
        v_motion_feat_dim=margs.v_motion_feat_dim,
        v_appear_feat_dim=margs.v_appear_feat_dim,
    )
    params = torch_state_dict_to_params(_sd_numpy(model), cfg)
    _, template = build_model_and_params(cfg, seed=0)
    got = _shapes(params)
    want = _shapes(jax.device_get(template))
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))}\n"
        f"extra: {sorted(set(got) - set(want))}\n"
        f"shape diffs: {sorted(k for k in set(got) & set(want) if got[k] != want[k])}")


@pytest.fixture(scope="module")
def ref_tan_model():
    """The REAL CONE_TAN built from the shipped experiment yaml
    (cone_2dtan/lib/models/cone_tan.py:11-23)."""
    import types

    class _EDict(dict):
        """Minimal easydict stand-in: attribute access + RECURSIVE dict
        conversion (update_config assigns whole yaml sub-dicts, which the
        real easydict deep-wraps)."""

        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in {**(d or {}), **kw}.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, _EDict):
                v = _EDict(v)
            super().__setitem__(k, v)

        def update(self, other=None, **kw):
            for k, v in {**(other or {}), **kw}.items():
                self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    easydict = types.ModuleType("easydict")
    easydict.EasyDict = _EDict
    sys.modules.setdefault("easydict", easydict)
    sys.path.insert(0, os.path.join(REF, "cone_2dtan", "lib"))
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self

    from core.config import config, update_config

    update_config(os.path.join(
        REF, "cone_2dtan", "experiments", "ego4d",
        "2D-TAN-64x64-K9L4-pool-sw-0.5bias-nms-con-match-adapt.yaml"))
    from models.cone_tan import CONE_TAN

    # CONE_TAN reads the module-global config (cone_tan.py:13-15)
    return CONE_TAN(), config


def test_tan_converter_covers_real_state_dict(ref_tan_model, monkeypatch):
    """tan_state_dict_to_params consumes every key of the real
    CONE_TAN.state_dict() — real module names (frame_layer/fusion_layer/
    map_layer/pred_layer/adapter_layer), including with the `module.`
    DataParallel prefix the 2dtan driver saves under
    (moment_localization/train.py:133-135)."""
    import convert_tan_ckpt as ct

    model, _ = ref_tan_model
    for with_dp_prefix in (False, True):
        sd = _sd_numpy(model)
        if with_dp_prefix:
            sd = {f"module.{k}": v for k, v in sd.items()}

        tracked = []
        orig = ct._canonicalize

        def patched(blob):
            out = orig(blob)
            out = TrackingDict(out)
            tracked.append(out)
            return out

        monkeypatch.setattr(ct, "_canonicalize", patched)
        ct.tan_state_dict_to_params(sd)
        monkeypatch.setattr(ct, "_canonicalize", orig)
        t = tracked[-1]
        unread = set(t) - t.read
        assert not unread, f"converter never read: {sorted(unread)}"


def test_tan_converted_tree_matches_flax_structure(ref_tan_model):
    """Converted real-checkpoint tree == flax ConeTanModel parameter
    structure at the yaml geometry (tan_ego4d preset)."""
    import jax
    import jax.numpy as jnp

    import convert_tan_ckpt as ct

    from cone_tpu.config import tan_ego4d_config
    from cone_tpu.models.tan import ConeTanModel

    model, _ = ref_tan_model
    params = ct.tan_state_dict_to_params(_sd_numpy(model))

    cfg = tan_ego4d_config()
    tan = cfg.tan
    fm = ConeTanModel(tan)
    var = jax.eval_shape(
        lambda: fm.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, cfg.data.max_q_l, tan.t_feat_dim)),
            jnp.ones((2, cfg.data.max_q_l)),
            jnp.zeros((2, tan.num_clips * tan.frame_stride, tan.v_feat_dim)),
            jnp.zeros((2, tan.v_feat_dim)),
            jnp.zeros((2, tan.num_clips * tan.frame_stride, tan.v_feat_dim)),
            method=ConeTanModel.init_all,
        )
    )
    got = _shapes(params)
    want = {k: v for k, v in _shapes(var["params"]).items()
            # flax rnn scan wrappers add no params of their own
            }
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))}\n"
        f"extra: {sorted(set(got) - set(want))}\n"
        f"shape diffs: {sorted(k for k in set(got) & set(want) if got[k] != want[k])}")


def test_tan_converter_handles_sparse_prop_conv(ref_tan_model):
    """The SparsePropConv variant's per-scale Conv1d cascade
    (prop_modules/sparse.py:69-80) converts: every prop_layer.* key consumed,
    kernels transposed to flax conv_{scale}_{layer} layout."""
    import torch
    from types import SimpleNamespace as NS

    import convert_tan_ckpt as ct

    from models.prop_modules.sparse import SparsePropConv

    torch.manual_seed(0)
    prop = SparsePropConv(NS(NUM_SCALE_LAYERS=[16, 8, 8], HIDDEN_SIZE=256))
    model, _ = ref_tan_model
    sd = _sd_numpy(model)
    sd.update({f"prop_layer.{k}": v for k, v in _sd_numpy(prop).items()})
    params = ct.tan_state_dict_to_params(sd)
    assert "prop_layer" in params
    # scale 0 layer 0 is a k=1 conv, later scales start with k=3 stride 2
    assert params["prop_layer"]["conv_0_0"]["kernel"].shape == (1, 256, 256)
    assert params["prop_layer"]["conv_1_0"]["kernel"].shape == (3, 256, 256)
    n_expected = sum(1 for k in sd if k.startswith("prop_layer.")
                     and k.endswith(".weight"))
    assert len(params["prop_layer"]) == n_expected
    w = sd["prop_layer.layers.0.0.weight"]  # (out, in, k)
    np.testing.assert_array_equal(
        params["prop_layer"]["conv_0_0"]["kernel"], w.transpose(2, 1, 0))


def test_egovlp_converter_covers_vit_b16(monkeypatch):
    """Full-size SpaceTimeTransformer (ViT-B/16, 12 blocks, the released
    EgoVLP geometry) + vid_proj: the converter consumes every video-side key
    of the real state dict and reproduces the flax tower structure. The
    text-side keys (text_model.*, txt_proj.*) are consumed by the text
    extraction path (extract/text.py), not this converter."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, TOOLS)
    from gen_golden_egovlp import _shim_timm

    _shim_timm()
    sys.path.insert(0, os.path.join(REF, "run_on_video"))
    import torch

    from egovlp.video_transformer import SpaceTimeTransformer

    from cone_tpu.models.egovlp import (
        EgoVlpConfig, EgoVlpVideoTower, egovlp_state_dict_to_params,
    )

    torch.manual_seed(0)
    model = SpaceTimeTransformer(num_frames=4, time_init="zeros",
                                 attention_style="frozen-in-time")
    model.head = torch.nn.Identity()
    model.pre_logits = torch.nn.Identity()
    vid_proj = torch.nn.Linear(model.embed_dim, 256)

    sd = {f"video_model.{k}": v for k, v in _sd_numpy(model).items()}
    # FrozenInTime wraps vid_proj in Sequential -> 'vid_proj.0.*'
    # (egovlp/model.py:69-71)
    sd.update({f"vid_proj.0.{k}": v for k, v in _sd_numpy(vid_proj).items()})

    tracked = TrackingDict(sd)
    cfg = EgoVlpConfig()  # defaults ARE the ViT-B/16 release geometry
    n_side = cfg.img_size // cfg.patch_size
    params = egovlp_state_dict_to_params(
        tracked, depth=cfg.depth, num_frames=cfg.num_frames,
        num_patches=n_side * n_side + 1)
    unread = set(tracked) - tracked.read
    assert not unread, f"converter never read: {sorted(unread)}"

    tower = EgoVlpVideoTower(cfg)
    var = jax.eval_shape(
        lambda: tower.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, cfg.num_frames, cfg.img_size,
                                      cfg.img_size, 3))))
    got = _shapes(params)
    want = _shapes(var["params"])
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))}\n"
        f"extra: {sorted(set(got) - set(want))}\n"
        f"shape diffs: {sorted(k for k in set(got) & set(want) if got[k] != want[k])}")
