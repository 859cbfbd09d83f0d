"""Real-data readiness: the full reference-user journey as ONE chain (slow).

A reference user arriving with real Ego4D-style assets runs, in order: raw
challenge json -> `reformat` -> `convert-store` (features) -> convert a
reference-shaped torch checkpoint -> `infer` -> official nested-GT eval ->
challenge submission file. Every stage is individually tested elsewhere;
this test proves the CHAIN — each stage consuming the previous stage's real
artifacts through the real CLI/converter surfaces (subprocesses, CPU) — so
the first thing a real-data user does is known to work end-to-end.

Mirrors the reference README's own quick-start sequence
(/root/reference/README.md:60-130).
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


def _raw_challenge_json():
    """Synthetic Ego4D-NLQ-style nested challenge json: 2 videos, 2
    annotations each, clip-relative timestamps."""
    rng = np.random.default_rng(0)
    videos = []
    for v in range(2):
        dur = 100 + 20 * v
        queries = []
        for q in range(3):
            s = float(rng.uniform(0, dur - 15))
            queries.append({
                "query": f"where is object {v}{q}",
                "clip_start_sec": round(s, 2),
                "clip_end_sec": round(s + rng.uniform(3, 12), 2),
            })
        videos.append({
            "video_uid": f"vid{v}",
            "clips": [{
                "clip_uid": f"clip{v}",
                "video_start_sec": 0.0,
                "video_end_sec": float(dur),
                "annotations": [
                    {"annotation_uid": f"anno{v}a", "language_queries": queries[:2]},
                    {"annotation_uid": f"anno{v}b", "language_queries": queries[2:]},
                ],
            }],
        })
    return {"videos": videos}


def _run_cli(args, env, timeout=1800):
    r = subprocess.run([sys.executable, "-m", "cone_tpu.cli"] + args,
                       capture_output=True, text=True, env=env,
                       timeout=timeout, cwd=REPO)
    assert r.returncode == 0, (args, r.stderr[-3000:])
    return r.stdout


def test_reference_user_journey(tmp_path):
    from cone_tpu.config import (
        ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig,
    )
    from cone_tpu.utils.cache import jax_cache_dir
    from cone_tpu.utils.io import load_jsonl

    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=jax_cache_dir("cpu"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )

    # ---- stage 0: the raw assets a real user starts from -----------------
    raw = _raw_challenge_json()
    raw_path = tmp_path / "nlq_val.json"
    raw_path.write_text(json.dumps(raw))

    # ---- stage 1: reformat (challenge json -> flat jsonl) ----------------
    val_jsonl = tmp_path / "val.jsonl"
    out = _run_cli(["reformat", "--dset", "ego4d", "--input", str(raw_path),
                    "--output", str(val_jsonl)], env)
    rows = load_jsonl(str(val_jsonl))
    assert len(rows) == 6 and all("timestamps" in r for r in rows)

    # ---- stage 2: convert-store (npy features -> .cfs) -------------------
    rng = np.random.default_rng(1)
    vid_npy = tmp_path / "vid_npy"
    os.makedirs(vid_npy)
    for v, dur in (("clip0", 100), ("clip1", 120)):
        np.save(vid_npy / f"{v}.npy",
                rng.standard_normal((dur, DIM)).astype(np.float32))
    tok_npy, cls_npy = tmp_path / "tok_npy", tmp_path / "cls_npy"
    os.makedirs(tok_npy)
    os.makedirs(cls_npy)
    for r in rows:
        lq = int(rng.integers(4, 8))
        np.save(tok_npy / f"{r['query_id']}.npy",
                rng.standard_normal((lq, DIM)).astype(np.float32))
        np.save(cls_npy / f"{r['query_id']}.npy",
                rng.standard_normal(DIM).astype(np.float32))  # 1-D cls row

    feat = tmp_path / "features"
    text = feat / "text"
    os.makedirs(text)
    _run_cli(["convert-store", "--format", "npy_dir", "--input", str(vid_npy),
              "--output", str(feat / "video.cfs")], env)
    _run_cli(["convert-store", "--format", "npy_dir", "--input", str(tok_npy),
              "--output", str(text / "tokens.cfs")], env)
    _run_cli(["convert-store", "--format", "npy_dir", "--input", str(cls_npy),
              "--output", str(text / "cls.cfs")], env)

    # ---- stage 3: a reference-shaped torch checkpoint --------------------
    # Built through the pinned inverse converter (key-coverage-tested
    # against the live reference), then torch.save'd with the reference's
    # {"model": state_dict, "epoch": N} wrapper (cone/train.py:184-191).
    import torch

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_ckpt import jax_to_numpy, params_to_torch_state_dict

    from cone_tpu.models.init import build_model_and_params

    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32),
        data=DataConfig(dset_name="ego4d", max_v_l=32, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256,
                        appearance_feat_dir=str(feat / "video.cfs"),
                        t_feat_dir=str(text)),
        train=TrainConfig(bsz=4),
        eval=EvalConfig(query_chunk=4),
    )
    _, params = build_model_and_params(cfg.model, seed=1)
    sd = params_to_torch_state_dict(jax_to_numpy(params), cfg.model)
    ref_ckpt = tmp_path / "model_best.ckpt"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}, "epoch": 7},
               str(ref_ckpt))
    cfg_path = tmp_path / "cfg.json"
    cfg.save(str(cfg_path))

    workdir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_ckpt.py"),
         "--ckpt", str(ref_ckpt), "--workdir", str(workdir),
         "--config", str(cfg_path)],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(workdir / "model_converted.msgpack")
    assert os.path.exists(workdir / "config.json")

    # ---- stage 4: infer on the converted checkpoint + in-run official eval
    out = _run_cli(["infer", "--workdir", str(workdir), "--ckpt", "converted",
                    "--eval_path", str(val_jsonl), "--save_all",
                    "--ego4d_gt", str(raw_path)], env)
    assert "restored 'converted' (epoch 7)" in out
    assert "Rank@1" in out and "Official Ego4D" in out
    preds = load_jsonl(str(workdir / "inference_converted_preds.jsonl"))
    assert {p["query_id"] for p in preds} == {r["query_id"] for r in rows}
    for p in preds:
        for st, ed, *scores in p["predicted_times"]:
            assert np.isfinite([st, ed] + scores).all()

    # ---- stage 5: the challenge submission file + standalone official eval
    sub_path = workdir / "submission_ego4d_converted.json"
    assert os.path.exists(sub_path)
    sub = json.loads(sub_path.read_text())
    assert sub["challenge"] == "ego4d_nlq_challenge" and sub["results"]
    for res in sub["results"]:
        assert {"clip_uid", "annotation_uid", "query_idx",
                "predicted_times"} <= set(res)

    out = _run_cli(["eval", "--submission", str(sub_path),
                    "--ego4d_gt", str(raw_path)], env)
    assert "Official Ego4D" in out and "Rank@1" in out
