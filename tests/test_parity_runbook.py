"""Smoke-test the real-data recall-parity runbook (docs/REAL_DATA.md).

scripts/parity_ego4d.sh is the one command that proves the mission's
real-data recall claim when real assets exist. This test runs the ACTUAL
script on synthetic assets (the journey-test chain behind one entry point):
raw challenge json + npy feature dirs + a reference-shaped torch checkpoint
-> reformat -> convert-store -> convert_ckpt -> infer -> official eval ->
--expect diff. Verifies the chain completes, the diff PASSES under a wide
tolerance, and a deliberately wrong expectation FAILS with a nonzero exit.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 32


def test_parity_runbook_script(tmp_path):
    import torch

    from cone_tpu.config import (
        ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig,
    )
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.utils.cache import jax_cache_dir

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_ckpt import jax_to_numpy, params_to_torch_state_dict

    from test_real_data_journey import _raw_challenge_json

    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=jax_cache_dir("cpu"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )

    # ---- synthetic stand-ins for the real assets --------------------------
    raw = _raw_challenge_json()
    raw_path = tmp_path / "nlq_val.json"
    raw_path.write_text(json.dumps(raw))

    rng = np.random.default_rng(1)
    vid_npy, tok_npy, cls_npy = (tmp_path / d for d in
                                 ("vid_npy", "tok_npy", "cls_npy"))
    for d in (vid_npy, tok_npy, cls_npy):
        os.makedirs(d)
    for v, dur in (("clip0", 100), ("clip1", 120)):
        np.save(vid_npy / f"{v}.npy",
                rng.standard_normal((dur, DIM)).astype(np.float32))
    from cone_tpu.data.reformat import reformat_ego4d

    qids = [r["query_id"] for r in reformat_ego4d(raw)]
    assert len(qids) == 6
    for qid in qids:
        lq = int(rng.integers(4, 8))
        np.save(tok_npy / f"{qid}.npy",
                rng.standard_normal((lq, DIM)).astype(np.float32))
        np.save(cls_npy / f"{qid}.npy",
                rng.standard_normal(DIM).astype(np.float32))

    # tiny geometry config file (PRESET accepts a json path) + a matching
    # reference-shaped checkpoint via the pinned inverse converter
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32),
        data=DataConfig(dset_name="ego4d", max_v_l=32, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        train=TrainConfig(bsz=4),
        eval=EvalConfig(query_chunk=4),
    )
    cfg_path = tmp_path / "tiny.json"
    cfg.save(str(cfg_path))
    _, params = build_model_and_params(cfg.model, seed=1)
    sd = params_to_torch_state_dict(jax_to_numpy(params), cfg.model)
    ckpt = tmp_path / "model_best.ckpt"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}, "epoch": 7}, str(ckpt))

    # ---- the runbook command, wide tolerance: chain must PASS -------------
    out = tmp_path / "parity_out"
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "parity_ego4d.sh"), str(out),
         str(raw_path), str(ckpt), str(vid_npy), str(tok_npy), str(cls_npy),
         "npy_dir", "R1@0.3=0,R5@0.3=0,mIoU=0", "101"],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
        env=dict(env, PRESET=str(cfg_path)),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "parity check PASSED" in r.stdout
    sub_path = out / "run" / "submission_ego4d_converted.json"
    assert sub_path.exists()

    # ---- wrong expectation must FAIL with a nonzero exit ------------------
    r = subprocess.run(
        [sys.executable, "-m", "cone_tpu.cli", "eval",
         "--submission", str(sub_path), "--ego4d_gt", str(raw_path),
         "--expect", "R1@0.3=150", "--expect_tol", "0.1"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert r.returncode != 0
    assert "FAIL" in r.stdout and "parity check FAILED" in r.stderr + r.stdout
