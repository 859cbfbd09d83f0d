"""Real checkpoint-conversion workflow: torch .ckpt -> workdir -> restore ->
identical outputs to the golden reference forward."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cone_forward.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no fixture")


@pytest.mark.slow
def test_convert_ckpt_to_workdir_and_restore(tmp_path):
    import torch

    from cone_tpu.config import ConeConfig, DataConfig, ModelConfig
    from cone_tpu.models.cone import ConeModel
    from cone_tpu.train.checkpoint import CheckpointManager
    from cone_tpu.models.init import build_model_and_params

    g = dict(np.load(GOLDEN).items())
    sd = {k[3:]: torch.tensor(v) for k, v in g.items() if k.startswith("w::")}
    ckpt_path = str(tmp_path / "model_best.ckpt")
    torch.save({"model": sd, "epoch": 42}, ckpt_path)

    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=36, v_motion_feat_dim=40,
                          v_appear_feat_dim=36, max_q_l=20, max_v_l=20),
        data=DataConfig(max_v_l=20, max_q_l=20),
    )
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)

    workdir = str(tmp_path / "converted")
    r = subprocess.run(
        [sys.executable, "tools/convert_ckpt.py", "--ckpt", ckpt_path,
         "--workdir", workdir, "--config", cfg_path],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(workdir, "model_converted.msgpack"))

    cfg2 = CheckpointManager.load_config(workdir)
    model, template = build_model_and_params(cfg2.model, seed=0)
    params, _, epoch, _ = CheckpointManager(workdir).restore("converted", template)
    assert epoch == 42

    out = model.apply(
        {"params": params},
        jnp.asarray(g["src_txt"]), jnp.asarray(g["src_txt_mask"]),
        jnp.asarray(g["src_vid"]), jnp.asarray(g["src_vid_mask"]),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out["pred_spans"]),
                               g["pred_spans"], atol=2e-5)


def test_params_to_torch_roundtrip():
    """The export direction (tools/convert_ckpt.py --export): a cone_tpu
    param tree -> reference-named state dict -> param tree is EXACT, so
    cone_tpu-trained weights load into the reference PyTorch model
    losslessly (the inverse of the import mapping the golden tests pin)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import jax
    from convert_ckpt import params_to_torch_state_dict, torch_state_dict_to_params

    from cone_tpu.config import ModelConfig
    from cone_tpu.models.init import build_model_and_params

    cfg = ModelConfig(hidden_dim=32, nheads=4, dim_feedforward=64,
                      t_feat_dim=24, v_motion_feat_dim=28,
                      v_appear_feat_dim=24, max_q_l=8, max_v_l=16,
                      use_txt_pos=True)
    _, params = build_model_and_params(cfg, seed=3)
    sd = params_to_torch_state_dict(jax.device_get(params), cfg)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    back = torch_state_dict_to_params(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      flat_b[jax.tree_util.keystr(k)],
                                      err_msg=jax.tree_util.keystr(k))
