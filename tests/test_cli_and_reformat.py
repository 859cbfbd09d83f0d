"""CLI + reformatters: ego4d/mad reformat parity, train filters, end-to-end
CLI train+infer on packed stores written to disk."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from cone_tpu.data.reformat import (
    ego4d_flat_to_nested,
    filter_train_ego4d,
    filter_train_mad,
    reformat_ego4d,
    reformat_mad,
)


def _nested_fixture():
    return {
        "videos": [
            {
                "video_uid": "v1",
                "clips": [
                    {
                        "clip_uid": "c1",
                        "video_start_sec": 10.4,
                        "video_end_sec": 490.6,
                        "annotations": [
                            {
                                "annotation_uid": "a1",
                                "language_queries": [
                                    {"query": "where is x",
                                     "clip_start_sec": 5.0, "clip_end_sec": 9.0},
                                    {"query": "",  # dropped
                                     "clip_start_sec": 0.0, "clip_end_sec": 1.0},
                                    {"query": "who did y",
                                     "clip_start_sec": 100.0, "clip_end_sec": 130.0},
                                ],
                            }
                        ],
                    }
                ],
            }
        ]
    }


def test_reformat_ego4d():
    rows = reformat_ego4d(_nested_fixture())
    assert len(rows) == 2  # empty query dropped
    r = rows[0]
    assert r["query_id"] == "a1_0"
    assert r["duration"] == 491 - 10  # normalize_sec rounding
    assert r["timestamps"] == [5.0, 9.0]
    assert rows[1]["query_id"] == "a1_2"

    test_rows = reformat_ego4d(_nested_fixture(), test_split=True)
    assert "timestamps" not in test_rows[0]


def test_reformat_mad():
    raw = {
        "q1": {"sentence": "s1", "movie_duration": 7200.0, "movie": "m1",
               "timestamps": [10.0, 20.0]},
    }
    rows = reformat_mad(raw)
    assert rows[0] == {
        "query": "s1", "query_id": "q1", "duration": 7200.0, "clip_id": "m1",
        "video_id": "m1", "timestamps": [10.0, 20.0],
    }


def test_filter_train_rules():
    mk = lambda ts, dur=480: {"timestamps": ts, "duration": dur,
                              "clip_video_start_end": [0, dur]}
    rows = [
        mk([5, 10]),            # keep
        mk([-1, 10]),           # mad: drop (start<0)
        mk([500, 510]),         # drop (start >= duration)
        mk([5, 5]),             # drop (zero length)
        mk([100, 430]),         # ego4d: drop (no negative window)
    ]
    kept_mad = filter_train_mad(rows)
    assert kept_mad == [rows[0], rows[4]]
    kept = filter_train_ego4d(rows)
    assert kept == [rows[0], rows[1]]  # ego4d has no start<0 rule


def test_flat_to_nested_roundtrip():
    rows = reformat_ego4d(_nested_fixture())
    nested = ego4d_flat_to_nested(rows)
    rows2 = reformat_ego4d(
        {
            "videos": [
                {
                    "video_uid": v["video_uid"],
                    "clips": [
                        dict(c, video_start_sec=0, video_end_sec=0)
                        for c in v["clips"]
                    ],
                }
                for v in nested["videos"]
            ]
        }
    )
    assert [r["query_id"] for r in rows2] == [r["query_id"] for r in rows]
    assert [r["timestamps"] for r in rows2] == [r["timestamps"] for r in rows]


def test_cli_eval_standalone(tmp_path, capsys):
    """`cone_tpu eval`: recall tables from files alone (the reference's
    standalone_eval CLI surface, evaluate_ego4d_nlq.py:140-171)."""
    from cone_tpu.cli import main
    from cone_tpu.utils.io import save_jsonl

    gt = [
        {"query_id": "a_0", "timestamps": [10.0, 20.0]},
        {"query_id": "a_1", "timestamps": [30.0, 40.0]},
    ]
    sub = [
        # hit for a_0 at rank 1 (IoU 1.0); miss then hit at rank 2 for a_1
        {"query_id": "a_0", "predicted_times": [[10.0, 20.0, 0.9]]},
        {"query_id": "a_1",
         "predicted_times": [[0.0, 5.0, 0.8], [30.0, 40.0, 0.7]]},
    ]
    save_jsonl(gt, str(tmp_path / "gt.jsonl"))
    save_jsonl(sub, str(tmp_path / "sub.jsonl"))
    out = tmp_path / "tables.txt"
    main(["eval", "--submission", str(tmp_path / "sub.jsonl"),
          "--gt", str(tmp_path / "gt.jsonl"), "--dset", "ego4d",
          "--topK", "1", "5", "--out", str(out)])
    printed = capsys.readouterr().out
    # R@1 = 50% at both IoUs, R@5 = 100%; mIoU of first preds = (1.0 + 0)/2
    assert "50.00" in printed and "100.00" in printed
    assert "mIoU" in printed
    assert "50.00" in out.read_text()

    # window-recall mode (evaluate_pre_filtered_window.py CLI counterpart):
    # stride = max_v_l/2 = 16; a_0 GT [10,20]s -> windows {0,1,2}, hit at
    # rank 2; a_1 GT [30,40]s -> {1,2,3}, no hit
    save_jsonl([{"query_id": "a_0", "ranklist": [5, 0]},
                {"query_id": "a_1", "ranklist": [7, 9]}],
               str(tmp_path / "windows.jsonl"))
    main(["eval", "--submission", str(tmp_path / "sub.jsonl"),
          "--gt", str(tmp_path / "gt.jsonl"),
          "--ranklists", str(tmp_path / "windows.jsonl"),
          "--clip_length", "1.0", "--max_v_l", "32", "--topK", "1", "2"])
    printed = capsys.readouterr().out
    assert "0.00" in printed and "50.00" in printed

    # official nested path
    nested = {"videos": [{"clips": [{"clip_uid": "c", "annotations": [
        {"annotation_uid": "a", "language_queries": [
            {"clip_start_sec": 10.0, "clip_end_sec": 20.0},
            {"clip_start_sec": 30.0, "clip_end_sec": 40.0},
        ]}]}]}]}
    challenge = {"results": [
        {"clip_uid": "c", "annotation_uid": "a", "query_idx": 0,
         "predicted_times": [[10.0, 20.0]]},
        {"clip_uid": "c", "annotation_uid": "a", "query_idx": 1,
         "predicted_times": [[0.0, 5.0], [30.0, 40.0]]},
    ]}
    json.dump(nested, open(tmp_path / "gt.json", "w"))
    json.dump(challenge, open(tmp_path / "sub.json", "w"))
    main(["eval", "--submission", str(tmp_path / "sub.json"),
          "--ego4d_gt", str(tmp_path / "gt.json"), "--topK", "1", "5"])
    printed = capsys.readouterr().out
    assert "50.00" in printed and "100.00" in printed


def test_cli_eval_expect_window_recall(tmp_path, capsys):
    """--expect works in --ranklists (window-recall) mode too — R<k>
    entries diff against the coarse recall table instead of being silently
    ignored (round-5 review fix)."""
    import pytest

    from cone_tpu.cli import main
    from cone_tpu.utils.io import save_jsonl

    gt = [{"query_id": "a_0", "timestamps": [10.0, 20.0]},
          {"query_id": "a_1", "timestamps": [30.0, 40.0]}]
    save_jsonl(gt, str(tmp_path / "gt.jsonl"))
    # stride 16: a_0 GT -> windows {0,1,2} (hit at rank 2); a_1 -> no hit
    save_jsonl([{"query_id": "a_0", "ranklist": [5, 0]},
                {"query_id": "a_1", "ranklist": [7, 9]}],
               str(tmp_path / "windows.jsonl"))
    args = ["eval", "--gt", str(tmp_path / "gt.jsonl"),
            "--ranklists", str(tmp_path / "windows.jsonl"),
            "--clip_length", "1.0", "--max_v_l", "32", "--topK", "1", "2"]
    main(args + ["--expect", "R1=0,R2=50", "--expect_tol", "0.01"])
    assert "parity check PASSED" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="FAILED"):
        main(args + ["--expect", "R2=90", "--expect_tol", "0.5"])


def test_cli_eval_expect_normalizes_names(tmp_path, capsys):
    """--expect entry names normalize (R1@0.30 == R1@0.3) and mIoU diffs."""
    from cone_tpu.cli import main
    from cone_tpu.utils.io import save_jsonl

    gt = [{"query_id": "a_0", "timestamps": [10.0, 20.0]}]
    sub = [{"query_id": "a_0", "predicted_times": [[10.0, 20.0, 0.9]]}]
    save_jsonl(gt, str(tmp_path / "gt.jsonl"))
    save_jsonl(sub, str(tmp_path / "sub.jsonl"))
    main(["eval", "--submission", str(tmp_path / "sub.jsonl"),
          "--gt", str(tmp_path / "gt.jsonl"), "--dset", "ego4d",
          "--topK", "1", "--expect", "R1@0.30=100,mIoU=100",
          "--expect_tol", "0.01"])
    assert "parity check PASSED" in capsys.readouterr().out


def test_cli_train_dump_config_captures_flags(tmp_path):
    """--dump_config folds --debug/--train_path/--eval_path before writing
    (previously dumped the preset defaults, dropping those flags)."""
    import json as _json

    from cone_tpu.cli import main

    out = tmp_path / "cfg.json"
    main(["train", "--preset", "ego4d", "--workdir", str(tmp_path / "wd"),
          "--train_path", "tr.jsonl", "--eval_path", "val.jsonl",
          "--debug", "--dump_config", str(out)])
    cfg = _json.load(open(out))
    assert cfg["data"]["train_path"] == "tr.jsonl"
    assert cfg["data"]["eval_path"] == "val.jsonl"
    assert cfg["train"]["debug"] is True


def test_cli_ensemble(tmp_path):
    """`cone_tpu ensemble` fuses prediction jsonls and pads to exactly 5
    rows (ECCV_2022_workshop/ensemble.py recipe)."""
    from cone_tpu.cli import main
    from cone_tpu.eval.ensemble import ensemble_predictions
    from cone_tpu.utils.io import load_jsonl, save_jsonl

    rng = np.random.default_rng(0)

    def fake_sub(seed):
        rows = []
        rng = np.random.default_rng(seed)
        for q in range(3):
            times = []
            for _ in range(5):
                st = float(rng.uniform(0, 90))
                ed = st + float(rng.uniform(1, 10))
                times.append([round(st, 2), round(ed, 2),
                              float(rng.uniform()), float(rng.uniform()),
                              float(rng.uniform())])
            times.sort(key=lambda t: t[-1], reverse=True)
            rows.append({"query_id": f"q_{q}", "query": "x", "video_id": "v",
                         "clip_id": "v", "predicted_times": times})
        return rows

    subs = [fake_sub(s) for s in (1, 2, 3)]
    paths = []
    for i, s in enumerate(subs):
        p = str(tmp_path / f"m{i}.jsonl")
        # shuffle row order: the CLI must align by query_id
        save_jsonl(s[::-1] if i == 1 else s, p)
        paths.append(p)
    out = str(tmp_path / "fused.jsonl")
    main(["ensemble", "--inputs", *paths, "--output", out])
    fused = load_jsonl(out)
    assert len(fused) == 3
    assert all(len(r["predicted_times"]) == 5 for r in fused)
    expect = ensemble_predictions(subs)
    for got, exp in zip(fused, expect):
        assert got["query_id"] == exp["query_id"]
        np.testing.assert_allclose(got["predicted_times"],
                                   exp["predicted_times"], rtol=1e-6)


@pytest.mark.slow
def test_cli_train_infer_roundtrip(tmp_path):
    """Write packed stores + jsonl, run the real CLI train (1 epoch tiny) and
    infer in subprocesses."""
    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig
    from cone_tpu.data import make_synthetic_dataset, write_packed_store
    from cone_tpu.utils.io import save_jsonl

    dim = 32
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=32),
        data=DataConfig(dset_name="synthetic", max_v_l=32, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        train=TrainConfig(bsz=4, n_epoch=1, eval_epoch_interval=1,
                          save_interval=100),
        eval=EvalConfig(query_chunk=4),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=4,
                                ctx_l_range=(90, 140), dim=dim, seed=0)

    feat = tmp_path / "features"
    text = feat / "text"
    os.makedirs(text)
    write_packed_store(
        str(feat / "video.cfs"),
        {vid: ds.video_features(vid)[0] for vid in ds.video_ids},
    )
    write_packed_store(
        str(text / "tokens.cfs"),
        {e.query_id: ds.text.get_tokens(e.query_id) for e in ds.examples},
    )
    write_packed_store(
        str(text / "cls.cfs"),
        {e.query_id: ds.text.get_cls(e.query_id)[None] for e in ds.examples},
    )
    jsonl = tmp_path / "train.jsonl"
    save_jsonl([e.__dict__ for e in ds.examples], str(jsonl))
    cfg_path = tmp_path / "config.json"
    cfg.replace(
        data=cfg.data.__class__(**{
            **cfg.data.__dict__,
            "appearance_feat_dir": str(feat / "video.cfs"),
            "t_feat_dir": str(text),
        })
    ).save(str(cfg_path))

    from cone_tpu.utils.cache import jax_cache_dir

    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=jax_cache_dir("cpu"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )
    workdir = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "-m", "cone_tpu.cli", "train", "--config", str(cfg_path),
         "--workdir", workdir, "--train_path", str(jsonl),
         "--eval_path", str(jsonl)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(workdir, "model_best.msgpack"))

    r = subprocess.run(
        [sys.executable, "-m", "cone_tpu.cli", "infer", "--workdir", workdir,
         "--ckpt", "best", "--save_all"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Rank@1" in r.stdout
    for f in ["inference_best_preds.jsonl", "inference_best_windows.jsonl",
              "inference_best_proposal_preds.jsonl",
              "inference_best_matching_preds.jsonl"]:
        assert os.path.exists(os.path.join(workdir, f)), f


def test_cli_infer_untrained(tmp_path, capsys):
    """`infer --untrained`: score fresh-init weights with no checkpoint in
    the workdir (the reference's --eval_untrained debug flag,
    cone/config.py:62). In-process on the CPU backend."""
    from cone_tpu.cli import main
    from cone_tpu.config import (ConeConfig, DataConfig, EvalConfig,
                                 ModelConfig, TrainConfig)
    from cone_tpu.data import make_synthetic_dataset, write_packed_store
    from cone_tpu.utils.io import save_jsonl

    dim = 32
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=32),
        data=DataConfig(dset_name="synthetic", max_v_l=32, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        train=TrainConfig(bsz=4),
        eval=EvalConfig(query_chunk=4),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=1, queries_per_video=4,
                                ctx_l_range=(90, 140), dim=dim, seed=0)
    feat = tmp_path / "features"
    text = feat / "text"
    os.makedirs(text)
    write_packed_store(str(feat / "video.cfs"),
                       {v: ds.video_features(v)[0] for v in ds.video_ids})
    write_packed_store(str(text / "tokens.cfs"),
                       {e.query_id: ds.text.get_tokens(e.query_id)
                        for e in ds.examples})
    write_packed_store(str(text / "cls.cfs"),
                       {e.query_id: ds.text.get_cls(e.query_id)[None]
                        for e in ds.examples})
    jsonl = tmp_path / "eval.jsonl"
    save_jsonl([e.__dict__ for e in ds.examples], str(jsonl))
    workdir = tmp_path / "run"
    os.makedirs(workdir)
    cfg.replace(data=cfg.data.__class__(**{
        **cfg.data.__dict__,
        "appearance_feat_dir": str(feat / "video.cfs"),
        "t_feat_dir": str(text),
    })).save(str(workdir / "config.json"))

    main(["infer", "--workdir", str(workdir), "--untrained",
          "--eval_path", str(jsonl)])
    outp = capsys.readouterr().out
    assert "UNTRAINED" in outp and "Rank@1" in outp
    assert os.path.exists(os.path.join(workdir, "inference_best_preds.jsonl"))


def test_cli_demo_surface(tmp_path, capsys, monkeypatch):
    """`cone_tpu demo`: the reference's run_on_video/run.py entry point.
    Heavy extraction is stubbed (the real predictor path is covered by
    test_serve_ensemble_multiscale); this pins the CLI surface — workdir
    checkpoint load, per-query prediction block, the reference's print
    format (run.py:59-62)."""
    import cone_tpu.serve.predictor as predictor_mod
    from cone_tpu.cli import main
    from cone_tpu.config import ConeConfig, DataConfig, ModelConfig
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.train.checkpoint import CheckpointManager

    dim = 32
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=32),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0,
                        topk_window=4, max_ctx_l=256),
    )
    model, params = build_model_and_params(cfg.model, seed=0)
    CheckpointManager(str(tmp_path), cfg).save("best", params, epoch=3)

    calls = {}

    class FakePredictor:
        def __init__(self, model, params, cfg, **kw):
            calls["backend"] = kw.get("backend")

        def localize_moment(self, video, query, top_k=None):
            calls["video"], calls["query"] = video, query
            calls["top_k"] = top_k
            return [[87.461, 103.112, 0.1, 0.2, 1.937],
                    [3.0, 4.0, 0.1, 0.2, 0.5]]

    monkeypatch.setattr(predictor_mod, "MomentPredictor", FakePredictor)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    main(["demo", "--workdir", str(tmp_path), "--video", "v.mp4",
          "--query", "Did I wash the green pepper?", "--backend", "clip",
          "--top_k", "2"])
    out = capsys.readouterr().out
    # the reference demo's sanity output block (README.md:209-216)
    assert ("Rank 1, moment boundary in seconds: 87.4610 103.1120,"
            " score: 1.9370") in out
    assert "Rank 2" in out
    assert calls == {"backend": "clip", "video": "v.mp4",
                     "query": "Did I wash the green pepper?", "top_k": 2}
