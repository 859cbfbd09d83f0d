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
