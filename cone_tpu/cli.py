"""Command-line drivers: train / infer / serve / eval / ensemble /
reformat / extract-text / convert-store.

Counterparts of the reference's cone/train.py + cone/inference.py CLIs and
data tools, driven by the typed ConeConfig (JSON) instead of ~60 argparse
flags. Presets reproduce the canonical script hyperparameters
(cone/scripts/train_ego4d.sh, train_mad.sh); any field can be overridden
with --set section.field=value.

Feature inputs: packed .cfs stores (see cone_tpu/data/store.py). The text
feature directory must contain tokens.cfs and cls.cfs.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def _apply_overrides(cfg, sets):
    for kv in sets or []:
        key, val = kv.split("=", 1)
        section, field = key.split(".", 1)
        sec = getattr(cfg, section)
        cur = getattr(sec, field)
        if isinstance(cur, bool):
            val = val.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        cfg = cfg.replace(**{section: dataclasses.replace(sec, **{field: val})})
    return cfg


def _load_cfg(args):
    from cone_tpu import config as C

    presets = {
        "ego4d": C.ego4d_config,
        "ego4d_scratch": C.ego4d_scratch_config,
        "mad": C.mad_config,
        "mad_scratch": C.mad_scratch_config,
        "tan_ego4d": C.tan_ego4d_config,
        "tan_mad": C.tan_mad_config,
    }
    if args.config:
        # user-supplied file: unknown keys are typos, fail loudly (workdir
        # snapshot loads via train/checkpoint.py stay tolerant for
        # cross-version round-trips)
        cfg = C.ConeConfig.load(args.config, strict=True)
    elif args.preset in presets:
        cfg = presets[args.preset]()
    else:
        cfg = C.ConeConfig()
    return _apply_overrides(cfg, args.set)


def _open_dataset(cfg, data_path):
    from cone_tpu.data.dataset import GroundingDataset
    from cone_tpu.data.store import TextFeatureStore, open_array_store

    d = cfg.data
    appear = open_array_store(d.appearance_feat_dir)
    motion = None
    if d.motion_feat_dir and d.motion_feat_dir != d.appearance_feat_dir:
        motion = open_array_store(d.motion_feat_dir)
    text = TextFeatureStore(
        open_array_store(os.path.join(d.t_feat_dir, "tokens.cfs")),
        open_array_store(os.path.join(d.t_feat_dir, "cls.cfs")),
    )
    return GroundingDataset(data_path, appear, text, d, video_motion_store=motion)


def cmd_train(args):
    import dataclasses as dc

    from cone_tpu.parallel.mesh import make_mesh
    from cone_tpu.train.loop import train

    if args.distributed:
        from cone_tpu.parallel.distributed import initialize

        # TPU pods: no args (auto-detected topology). CPU clusters/tests:
        # explicit coordinator + layout. Must run before ANY jax call that
        # initializes the XLA backend — main() skips the compilation-cache
        # setup for --distributed so it can happen here, after initialize.
        initialize(args.coordinator, args.num_processes, args.process_id)
        if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
            import jax

            from cone_tpu.utils.cache import jax_cache_dir

            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("CONE_TPU_JAX_CACHE",
                               jax_cache_dir(jax.default_backend())))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = _load_cfg(args)
    if args.debug:
        cfg = _apply_overrides(cfg, ["train.debug=true"])
    if args.train_path:
        cfg = cfg.replace(data=dc.replace(cfg.data, train_path=args.train_path))
    if args.eval_path:
        cfg = cfg.replace(data=dc.replace(cfg.data, eval_path=args.eval_path))
    if args.dump_config:
        # resolve preset/--config/--set/--debug/--*_path and write the
        # config json, no training — lets scripts materialize a
        # workdir-ready config.json (e.g. scripts/parity_ego4d.sh stage 3)
        # without a train run. Runs AFTER the flag folds above so the dump
        # reflects every CLI override, not just --set.
        os.makedirs(os.path.dirname(args.dump_config) or ".", exist_ok=True)
        cfg.save(args.dump_config)
        print(f"wrote resolved config to {args.dump_config}")
        return
    if args.synthetic:
        import dataclasses as dc

        from cone_tpu.data import make_synthetic_dataset

        dim = cfg.model.v_appear_feat_dim
        if cfg.model.t_feat_dim != dim:
            # synthetic text features share the appearance dim (the
            # matching branch requires cls dim == appearance dim), so
            # presets with wider token dims (tan_ego4d's RoBERTa-768,
            # the CLIP/RoBERTa variants) shrink to dim for smoke runs
            cfg = cfg.replace(model=dc.replace(cfg.model, t_feat_dim=dim),
                              tan=dc.replace(cfg.tan, t_feat_dim=dim))
        train_ds = make_synthetic_dataset(cfg.data, n_videos=8,
                                          queries_per_video=8, dim=dim, seed=0)
        eval_ds = train_ds
    else:
        train_ds = _open_dataset(cfg, cfg.data.train_path)
        eval_ds = (
            _open_dataset(cfg, cfg.data.eval_path) if cfg.data.eval_path else None
        )
    if cfg.data.train_data_ratio != 1.0:
        # train-split-only downsample (the reference's --train_data_ratio,
        # cone/config.py:29-32; data_ratio applies to every split)
        if eval_ds is train_ds:  # --synthetic aliases the splits; keep the
            import copy          # eval split full when truncating train

            eval_ds = copy.copy(train_ds)
            eval_ds.examples = list(train_ds.examples)
        n = int(len(train_ds.examples) * cfg.data.train_data_ratio)
        train_ds.examples = train_ds.examples[:n]
        print(f"train_data_ratio={cfg.data.train_data_ratio}: {n} train samples")
    tp = cfg.train.tp_devices
    mesh = make_mesh(tp=tp) if (args.mesh or tp > 1) else None
    train(cfg, train_ds, eval_ds, args.workdir, mesh=mesh, profile=args.profile,
          init_ckpt=args.init_ckpt)


def cmd_infer(args):
    from cone_tpu.train.checkpoint import CheckpointManager
    from cone_tpu.train.loop import build_family, evaluate
    from cone_tpu.utils.io import save_jsonl

    cfg = CheckpointManager.load_config(args.workdir)
    cfg = _apply_overrides(cfg, args.set)
    if getattr(args, "untrained", False):
        # the reference's --eval_untrained debug flag (cone/config.py:62):
        # score the fresh-init model, no checkpoint needed
        model, params = build_family(cfg, seed=cfg.train.seed)
        print("evaluating UNTRAINED (fresh-init) weights")
    else:
        model, template = build_family(cfg, seed=0)
        ckpt = CheckpointManager(args.workdir)
        params, _, epoch, _ = ckpt.restore(args.ckpt, template)
        print(f"restored '{args.ckpt}' (epoch {epoch})")

    eval_ds = _open_dataset(cfg, args.eval_path or cfg.data.eval_path)
    res = evaluate(model, params, eval_ds, cfg,
                   host_postproc=not args.fast_postproc, fused=args.fused)
    for t in res["tables"].values():
        print(t)
    # --results_dir redirects all outputs away from the train workdir (the
    # reference's --eval_results_dir, cone/config.py:233, :195-196)
    out_dir = args.results_dir or args.workdir
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"inference_{args.ckpt}_preds.jsonl")
    save_jsonl(res["submissions"]["fusion"], out)
    print(f"wrote {out}")
    if args.save_all:
        # all three scoring modalities (the reference's --save_all,
        # cone/config.py:124 + inference.py:322-331 ablation outputs)
        for name in ("proposal", "matching"):
            if name in res["submissions"]:
                p = os.path.join(out_dir,
                                 f"inference_{args.ckpt}_{name}_preds.jsonl")
                save_jsonl(res["submissions"][name], p)
                print(f"wrote {p}")
    # coarse-stage ranklists, evaluable standalone via `cone_tpu eval
    # --ranklists` (the reference saves these for
    # evaluate_pre_filtered_window.py's file-driven CLI)
    rank_out = os.path.join(out_dir, f"inference_{args.ckpt}_windows.jsonl")
    save_jsonl(
        [{"query_id": q, "ranklist": [int(w) for w in r]}
         for q, r in res["ranklists"].items()],
        rank_out,
    )
    print(f"wrote {rank_out}")

    from cone_tpu.eval.submission import to_ego4d_challenge, write_submission

    sub_path = os.path.join(
        out_dir,
        f"submission_{cfg.data.dset_name}_{args.ckpt}."
        + ("json" if cfg.data.dset_name == "ego4d" else "jsonl"),
    )
    write_submission(res["submissions"]["fusion"], sub_path, cfg.data.dset_name)
    print(f"wrote {sub_path}")

    if args.ego4d_gt:
        from cone_tpu.eval.metrics import display_ego4d_results, evaluate_ego4d_nlq
        from cone_tpu.utils.io import load_json

        gt = load_json(args.ego4d_gt)
        preds = to_ego4d_challenge(res["submissions"]["fusion"])["results"]
        results, miou = evaluate_ego4d_nlq(preds, gt, [0.3, 0.5], [1, 5, 10, 50, 100])
        print(display_ego4d_results(results, miou, [0.3, 0.5],
                                    [1, 5, 10, 50, 100], title="Official Ego4D"))


def cmd_demo(args):
    """The reference's demo entry point (run_on_video/run.py run_example):
    one video file + query text -> ranked moments printed, one block per
    query. backend="egovlp" is the reference demo's actual backbone (video
    through the flax EgoVlpVideoTower on the accelerator); backend="clip"
    swaps in CLIP towers (host torch or the flax towers with
    --clip_engine flax). Extracted video features cache to --cache_dir
    like the reference's .pt cache (run.py:30-38)."""
    from cone_tpu.serve.predictor import MomentPredictor
    from cone_tpu.train.checkpoint import CheckpointManager
    from cone_tpu.train.loop import build_family

    cfg = CheckpointManager.load_config(args.workdir)
    cfg = _apply_overrides(cfg, args.set)
    model, template = build_family(cfg, seed=0)
    params, _, epoch, _ = CheckpointManager(args.workdir).restore(
        args.ckpt, template)
    print(f"restored '{args.ckpt}' (epoch {epoch})")
    pred = MomentPredictor(
        model, params, cfg, backend=args.backend,
        clip_engine=args.clip_engine,
        egovlp_checkpoint=args.egovlp_checkpoint,
        cache_dir=args.cache_dir)
    for query in args.query:
        print("text_query: ", query)
        moments = pred.localize_moment(args.video, query, top_k=args.top_k)
        # the reference's output block (run.py:59-62); rows are
        # [st, ed, prop, match, fusion], fusion-ranked
        print("-----------------------------prediction"
              "------------------------------------")
        for i, m in enumerate(moments):
            print("Rank %d, moment boundary in seconds: %.4f %.4f,"
                  " score: %.4f" % (i + 1, m[0], m[1], m[4]))


def cmd_eval(args):
    """Standalone metric evaluation over submission files — the counterpart
    of the reference's standalone_eval CLIs (evaluate_ego4d_nlq.py:140-171,
    evaluate_mad.py:119-150): compute recall tables from files alone, no
    model or features needed."""
    if not args.ranklists and not args.submission:
        raise SystemExit("--submission is required (unless --ranklists)")
    from cone_tpu.eval.metrics import (
        display_ego4d_results, display_recall_table, evaluate_ego4d_nlq,
        evaluate_recall_table, mean_first_iou,
    )
    from cone_tpu.utils.io import load_json, load_jsonl

    if args.thresholds:
        thresholds = [float(x) for x in args.thresholds]
    else:
        thresholds = [0.1, 0.3, 0.5] if args.dset == "mad" else [0.3, 0.5]
    topk = [int(x) for x in args.topK] if args.topK else [1, 5, 10, 50, 100]

    if args.ranklists:
        # coarse-stage window recall from a saved ranklist file (the
        # reference's evaluate_pre_filtered_window.py standalone CLI)
        from cone_tpu.eval.metrics import (
            display_window_results, evaluate_window_ranklists,
        )

        assert args.gt, "window-recall eval needs --gt (flat jsonl)"
        gt = load_jsonl(args.gt)
        ranklists = {r["query_id"]: r["ranklist"]
                     for r in load_jsonl(args.ranklists)}
        wtopk = [int(x) for x in args.topK] if args.topK else [1, 5, 10, 30, 50]
        rec = evaluate_window_ranklists(
            ranklists, gt, wtopk, args.clip_length, args.max_v_l,
            match_number=not args.no_match_number)
        table = display_window_results(
            rec, wtopk, title=args.title or "Window Pre-filtering")
        print(table)
        if args.out:
            with open(args.out, "a") as f:
                f.write(table + "\n")
        if args.expect:
            # window-recall metrics are R<k> (no IoU threshold)
            _expect_diff(args.expect, args.expect_tol,
                         {f"R{k}": 100 * float(rec[i])
                          for i, k in enumerate(wtopk)})
        return

    assert args.gt or args.ego4d_gt, "need --gt (flat jsonl) or --ego4d_gt"
    if args.ego4d_gt:
        # nested challenge GT json + challenge-format submission json
        gt = load_json(args.ego4d_gt)
        sub = load_json(args.submission)
        preds = sub["results"] if isinstance(sub, dict) else sub
        results, miou = evaluate_ego4d_nlq(preds, gt, thresholds, topk)
        table = display_ego4d_results(results, miou, thresholds, topk,
                                      title=args.title or "Official Ego4D")
        computed = {(k, t): 100 * float(results[ti][ki])
                    for ki, k in enumerate(topk)
                    for ti, t in enumerate(thresholds)}
    else:
        # flat jsonl GT (query_id + timestamps) + flat submission jsonl
        gt = load_jsonl(args.gt)
        sub = load_jsonl(args.submission)
        recall = evaluate_recall_table(sub, gt, thresholds, topk,
                                       match_number=not args.no_match_number)
        miou = mean_first_iou(sub, gt) if args.dset == "ego4d" else None
        table = display_recall_table(recall, thresholds, topk,
                                     title=args.title, mIoU=miou)
        computed = {(k, t): 100 * float(recall[ki][ti])
                    for ki, k in enumerate(topk)
                    for ti, t in enumerate(thresholds)}
    print(table)
    if args.out:
        with open(args.out, "a") as f:
            f.write(table + "\n")
    if args.expect:
        named = {f"R{k}@{t:g}": v for (k, t), v in computed.items()}
        if miou is not None:
            named["mIoU"] = 100 * float(miou)
        _expect_diff(args.expect, args.expect_tol, named)


def _expect_diff(expect: str, tol: float, computed: dict):
    """--expect parity diff against a published row (docs/REAL_DATA.md):
    comma-separated <name>=<percent> entries where <name> is a key of the
    computed table — R<k>@<t> (recall tables), R<k> (window recall), or
    mIoU. Prints one ok/FAIL line per entry; SystemExit on any miss."""
    fails = []
    for item in expect.split(","):
        name, want = item.split("=")
        name = name.strip()
        if name.lower() == "miou":
            key = "mIoU"
        elif "@" in name and name.startswith("R"):
            kk, tt = name[1:].split("@")  # normalize R1@0.30 -> R1@0.3
            key = f"R{int(kk)}@{float(tt):g}"
        else:
            key = name
        assert key in computed, (
            f"--expect {name}: not in the computed table "
            f"(available: {', '.join(computed)})")
        got = computed[key]
        delta = got - float(want)
        line = f"{name}: got {got:.2f}, expected {float(want):.2f} " \
               f"(delta {delta:+.2f}, tol {tol})"
        print(("  ok   " if abs(delta) <= tol else "  FAIL ") + line)
        if abs(delta) > tol:
            fails.append(name)
    if fails:
        raise SystemExit(f"parity check FAILED: {', '.join(fails)}")
    print("parity check PASSED")


def cmd_ensemble(args):
    """Fuse N models' prediction jsonls (ECCV'22 challenge recipe,
    ECCV_2022_workshop/ensemble.py:104-146). Rows are aligned by query_id
    (the reference zips three files written in the same order; sorting by
    query_id makes that robust to file order)."""
    from cone_tpu.eval.ensemble import ensemble_predictions
    from cone_tpu.utils.io import load_jsonl, save_jsonl

    subs = [sorted(load_jsonl(p), key=lambda r: str(r["query_id"]))
            for p in args.inputs]
    qids = [tuple(r["query_id"] for r in s) for s in subs]
    assert all(q == qids[0] for q in qids), "inputs cover different query sets"
    fused = ensemble_predictions(subs, max_input=args.max_input,
                                 top1_max_input=args.top1_max_input)
    save_jsonl(fused, args.output)
    print(f"wrote {len(fused)} fused rows to {args.output}")


def cmd_serve(args):
    """HTTP serving front end over a trained workdir (serve/server.py):
    /search across the resident corpus, /localize for one-shot videos,
    /add_video, /healthz, /stats."""
    from cone_tpu.serve.server import MomentService, make_server
    from cone_tpu.train.checkpoint import CheckpointManager
    from cone_tpu.train.loop import build_family

    cfg = CheckpointManager.load_config(args.workdir)
    cfg = _apply_overrides(cfg, args.set)
    model, template = build_family(cfg, seed=0)
    ckpt = CheckpointManager(args.workdir)
    params, _, epoch, _ = ckpt.restore(args.ckpt, template)
    print(f"restored '{args.ckpt}' (epoch {epoch})")
    ds = _open_dataset(cfg, args.preload_path) if args.preload_path else None
    encoder = None
    if args.text_backend:
        # raw-text requests: encode queries with the predictor's host-side
        # text towers (clip / roberta / egovlp)
        from cone_tpu.serve.predictor import MomentPredictor

        pred = MomentPredictor(model, params, cfg, backend=args.text_backend,
                               egovlp_checkpoint=args.egovlp_checkpoint,
                               clip_engine=args.text_engine)
        encoder = pred.text_features
    service = MomentService(model, params, cfg, text_encoder=encoder,
                            dataset=ds,
                            batch_window_ms=args.batch_window_ms,
                            max_batch=args.max_batch)
    if args.load_corpus:
        n = service.retriever.load_corpus(args.load_corpus)
        print(f"loaded {n} videos from {args.load_corpus}")
    srv = make_server(service, host=args.host, port=args.port)
    print(f"serving {len(service.retriever.clip_ids)} videos on "
          f"http://{srv.server_address[0]}:{srv.server_address[1]}")
    srv.serve_forever()


def cmd_reformat(args):
    from cone_tpu.data import reformat
    from cone_tpu.utils.io import load_json, save_jsonl

    raw = load_json(args.input)
    if args.dset == "ego4d":
        rows = reformat.reformat_ego4d(raw, test_split=args.test_split)
        if args.filter_train:
            rows = reformat.filter_train_ego4d(rows)
    else:
        rows = reformat.reformat_mad(raw)
        if args.filter_train:
            rows = reformat.filter_train_mad(rows)
    save_jsonl(rows, args.output)
    print(f"wrote {len(rows)} rows to {args.output}")


def cmd_extract_video(args):
    """Video files -> one packed .cfs of clip features. backend=clip is
    the reference's feature_extraction/clip_extractor.py CLI surface;
    backend=egovlp runs the flax EgoVLP tower on the jax device (the
    reference extracts EgoVLP on GPU, run_on_video/egovlp_extrator.py)."""
    videos = {}
    for spec in args.videos:
        if "=" in spec:
            clip_id, path = spec.split("=", 1)
        else:
            clip_id, path = os.path.splitext(os.path.basename(spec))[0], spec
        if clip_id in videos:
            raise SystemExit(
                f"duplicate clip_id {clip_id!r} ({videos[clip_id]} vs {path})"
                " — disambiguate with explicit clip_id=path specs")
        videos[clip_id] = path
    if args.backend == "egovlp":
        from cone_tpu.extract.egovlp_video import extract_egovlp_video

        assert args.checkpoint, "--checkpoint required for backend=egovlp"
        extract_egovlp_video(videos, args.out, args.checkpoint,
                             fps=args.fps if args.fps is not None else 1.875,
                             clip_batch=(args.batch_size
                                         if args.batch_size is not None
                                         else 8))
    else:
        from cone_tpu.extract.video import extract_clip_video

        extract_clip_video(
            videos, args.out,
            model_name=args.model or "openai/clip-vit-base-patch32",
            fps=args.fps if args.fps is not None else 5.0,
            batch_size=(args.batch_size
                        if args.batch_size is not None else 64),
            device=args.device, engine=args.engine)
    print(f"wrote {len(videos)} video feature rows to {args.out}")


def cmd_extract_text(args):
    from cone_tpu.extract import text as tx

    if args.backend == "clip":
        tx.extract_clip_text(args.input, args.out,
                             model_name=args.model or "openai/clip-vit-base-patch32",
                             device=args.device, engine=args.engine)
    elif args.backend == "roberta":
        tx.extract_roberta_text(args.input, args.out,
                                model_name=args.model or "roberta-base",
                                device=args.device, engine=args.engine)
    else:
        assert args.checkpoint, "--checkpoint required for egovlp"
        tx.extract_egovlp_text(args.input, args.out, args.checkpoint,
                               model_name=args.model or "distilbert-base-uncased",
                               device=args.device, engine=args.engine)
    print(f"wrote text stores to {args.out}")


def cmd_convert_store(args):
    """LMDB / h5 / npy-dir / pt-dir -> packed .cfs store (replaces the
    reference's feature_extraction/misc converters)."""
    import numpy as np

    from cone_tpu.data.store import write_packed_store

    items = {}
    src = args.input
    if args.format == "lmdb":
        from cone_tpu.data.store import LmdbArrayStore

        store = LmdbArrayStore(src, array_key=args.array_key)
        for k in store.keys():
            items[k] = store.get(k)
    elif args.format == "h5":
        import h5py  # optional

        with h5py.File(src, "r") as f:
            for k in f.keys():
                items[k] = np.asarray(f[k], np.float32)
    elif args.format == "npy_dir":
        for name in sorted(os.listdir(src)):
            if name.endswith(".npy"):
                arr = np.load(os.path.join(src, name)).astype(np.float32)
                if arr.ndim == 1:
                    # per-query cls vectors (the reference merge script's
                    # cls .npy files are 1-D) -> one (1, D) row
                    arr = arr[None]
                items[os.path.splitext(name)[0]] = arr
    elif args.format == "pt_dir":
        import torch  # optional

        for name in sorted(os.listdir(src)):
            if name.endswith(".pt"):
                items[os.path.splitext(name)[0]] = (
                    torch.load(os.path.join(src, name), map_location="cpu")
                    .float().numpy()
                )
    write_packed_store(args.output, items)
    print(f"wrote {len(items)} entries to {args.output}")


def _force_platform_from_env():
    """Make JAX_PLATFORMS authoritative for CLI runs.

    On hosts whose PJRT plugin overrides the env var during registration
    (this environment's tunneled TPU plugin does), `JAX_PLATFORMS=cpu
    python -m cone_tpu.cli ...` would silently run on the TPU anyway —
    and die whenever the tunnel is wedged. `jax.config.update` before
    first backend use wins over the plugin (same pattern as
    __graft_entry__.dryrun_multichip and tests/conftest.py)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; env semantics apply


def main(argv=None):
    _force_platform_from_env()
    p = argparse.ArgumentParser(prog="cone_tpu")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax.config debug_nans: fail loudly at the op that"
                        " first produces a NaN (the 2D-TAN reference's"
                        " torch.autograd.set_detect_anomaly counterpart,"
                        " cone_2dtan/moment_localization/train.py:28)."
                        " Disables jit fast paths; debugging only")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a CONE model")
    t.add_argument("--config")
    t.add_argument("--preset",
                   choices=["ego4d", "ego4d_scratch", "mad", "mad_scratch",
                            "tan_ego4d", "tan_mad"],
                   default="ego4d",
                   help="*_scratch = same preset with fewer, wider heads +"
                        " bfloat16 compute (identical params; measured"
                        " faster serving and 7.3x faster steps — for"
                        " from-scratch training; converted checkpoints need"
                        " nheads=8 fp32). tan_* = the 2D-TAN base model"
                        " (cone_2dtan experiment yamls)")
    t.add_argument("--set", action="append", metavar="SEC.FIELD=VAL")
    t.add_argument("--workdir", required=True)
    t.add_argument("--train_path")
    t.add_argument("--eval_path")
    t.add_argument("--synthetic", action="store_true",
                   help="train on generated synthetic data (smoke runs)")
    t.add_argument("--debug", action="store_true",
                   help="smoke mode: 3 batches per epoch, one query chunk"
                        " per eval (the reference's --debug,"
                        " cone/config.py:27-28)")
    t.add_argument("--mesh", action="store_true", help="DP over all devices")
    t.add_argument("--profile", action="store_true",
                   help="jax.profiler trace of the first epoch")
    t.add_argument("--init_ckpt",
                   help="weights-only warm start: load model params (not"
                        " optimizer/epoch) from a checkpoint msgpack, e.g."
                        " tools/convert_ckpt.py output, before training")
    t.add_argument("--distributed", action="store_true",
                   help="multi-host: start the jax.distributed runtime"
                        " (combine with --mesh for the global DP mesh;"
                        " workdir must be on a shared filesystem)")
    t.add_argument("--coordinator",
                   help="coordinator host:port (omit on TPU pods:"
                        " auto-detected)")
    t.add_argument("--num_processes", type=int)
    t.add_argument("--process_id", type=int)
    t.add_argument("--dump_config", metavar="PATH",
                   help="resolve preset/--config/--set, write the config"
                        " json to PATH and exit (no training)")
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("infer", help="evaluate a checkpoint")
    i.add_argument("--workdir", required=True)
    i.add_argument("--ckpt", default="best")
    i.add_argument("--eval_path")
    i.add_argument("--set", action="append")
    i.add_argument("--fast_postproc", action="store_true",
                   help="batched on-device fusion+NMS instead of the"
                        " reference-exact host path")
    i.add_argument("--ego4d_gt",
                   help="official nested Ego4D GT json: also run the"
                        " challenge evaluator")
    i.add_argument("--fused", action="store_true",
                   help="single-dispatch fused inference (fastest; device"
                        " postproc, all three scoring modalities)")
    i.add_argument("--results_dir",
                   help="write predictions/submissions here instead of the"
                        " workdir (reference --eval_results_dir)")
    i.add_argument("--save_all", action="store_true",
                   help="also write the proposal/matching modality"
                        " prediction files (reference --save_all)")
    i.add_argument("--untrained", action="store_true",
                   help="evaluate fresh-init weights, no checkpoint"
                        " (reference --eval_untrained, cone/config.py:62)")
    i.set_defaults(fn=cmd_infer)

    s = sub.add_parser("serve", help="HTTP moment-retrieval server over a"
                                     " trained workdir")
    s.add_argument("--workdir", required=True)
    s.add_argument("--ckpt", default="best")
    s.add_argument("--set", action="append")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--preload_path",
                   help="jsonl whose videos preload into the corpus (uses"
                        " the workdir config's feature stores)")
    s.add_argument("--text_engine", choices=["torch", "flax"],
                   default="torch",
                   help="clip text tower on host torch or the jax device")
    s.add_argument("--text_backend", choices=["clip", "egovlp"],
                   help="accept raw-text queries by encoding them host-side"
                        " (omit: requests must carry token/cls features)")
    s.add_argument("--egovlp_checkpoint")
    s.add_argument("--batch_window_ms", type=float, default=0.0,
                   help="dynamic /search micro-batching: concurrent requests"
                        " arriving within this window share one device sweep"
                        " (0 = off, one dispatch per request)")
    s.add_argument("--max_batch", type=int, default=32,
                   help="micro-batching cap per device sweep")
    s.add_argument("--load_corpus",
                   help="directory written by /save_corpus (or"
                        " CorpusRetriever.save_corpus) to rebuild the"
                        " serving library from at startup")
    s.set_defaults(fn=cmd_serve)

    d = sub.add_parser("demo", help="video file + query text -> ranked"
                       " moments (the reference's run_on_video/run.py)")
    d.add_argument("--workdir", required=True)
    d.add_argument("--ckpt", default="best")
    d.add_argument("--set", action="append", metavar="SEC.FIELD=VAL")
    d.add_argument("--video", required=True, help="video file (ffmpeg)")
    d.add_argument("--query", action="append", required=True,
                   help="query text; repeat for several queries")
    d.add_argument("--backend", choices=["clip", "egovlp"], default="egovlp",
                   help="feature backbone (the reference demo is EgoVLP)")
    d.add_argument("--clip_engine", choices=["torch", "flax"],
                   default="torch",
                   help="backend=clip: host torch vs flax-on-accelerator")
    d.add_argument("--egovlp_checkpoint",
                   help="released egovlp.pth (backend=egovlp)")
    d.add_argument("--cache_dir", default="feature_cache",
                   help="extracted-feature cache (run.py:30-38)")
    d.add_argument("--top_k", type=int, help="moments to print per query")
    d.set_defaults(fn=cmd_demo)

    v = sub.add_parser("eval", help="recall tables from submission files"
                                    " (standalone, no model)")
    v.add_argument("--submission",
                   help="prediction jsonl (flat) or challenge json (ego4d"
                        " official, with --ego4d_gt); not used in"
                        " --ranklists mode")
    v.add_argument("--gt", help="flat GT jsonl (query_id + timestamps)")
    v.add_argument("--ego4d_gt", help="official nested Ego4D GT json")
    v.add_argument("--dset", choices=["ego4d", "mad"], default="ego4d",
                   help="default thresholds (ego4d: 0.3/0.5 + mIoU;"
                        " mad: 0.1/0.3/0.5)")
    v.add_argument("--thresholds", nargs="+")
    v.add_argument("--topK", nargs="+")
    v.add_argument("--no_match_number", action="store_true",
                   help="evaluate the intersection of query ids instead of"
                        " requiring identical sets")
    v.add_argument("--ranklists",
                   help="window-ranklist jsonl (from `infer`): report"
                        " coarse-stage window recall instead"
                        " (evaluate_pre_filtered_window.py)")
    v.add_argument("--clip_length", type=float, default=0.535,
                   help="seconds per clip (window-recall mode)")
    v.add_argument("--max_v_l", type=int, default=90,
                   help="window length in clips (window-recall mode)")
    v.add_argument("--title")
    v.add_argument("--out", help="append the table to this file")
    v.add_argument("--expect",
                   help="parity diff: comma list of R<k>@<t>=<percent> /"
                        " mIoU=<percent> (e.g. the reference README row"
                        " 'R1@0.3=14.15,R5@0.3=30.33'); exits nonzero if"
                        " any metric is off by more than --expect_tol")
    v.add_argument("--expect_tol", type=float, default=0.5,
                   help="absolute tolerance in recall points for --expect")
    v.set_defaults(fn=cmd_eval)

    n = sub.add_parser("ensemble", help="fuse N prediction jsonls"
                                        " (ECCV'22 recipe)")
    n.add_argument("--inputs", nargs="+", required=True,
                   help="2+ prediction jsonls (from `infer`)")
    n.add_argument("--output", required=True)
    n.add_argument("--max_input", type=int, default=4,
                   help="top-N rows taken from each model")
    n.add_argument("--top1_max_input", type=int, default=1,
                   help="rows per model fed to the clustered top-1 synthesis")
    n.set_defaults(fn=cmd_ensemble)

    r = sub.add_parser("reformat", help="challenge json -> flat jsonl")
    r.add_argument("--dset", choices=["ego4d", "mad"], required=True)
    r.add_argument("--input", required=True)
    r.add_argument("--output", required=True)
    r.add_argument("--test_split", action="store_true")
    r.add_argument("--filter_train", action="store_true")
    r.set_defaults(fn=cmd_reformat)

    e = sub.add_parser("extract-text", help="query jsonl -> text feature stores")
    e.add_argument("--input", required=True, help="query jsonl")
    e.add_argument("--out", required=True, help="output dir (tokens.cfs + cls.cfs)")
    e.add_argument("--backend", choices=["clip", "roberta", "egovlp"],
                   required=True)
    e.add_argument("--model")
    e.add_argument("--checkpoint", help="EgoVLP checkpoint (txt projection)")
    e.add_argument("--device", default="cpu")
    e.add_argument("--engine", choices=["torch", "flax"], default="torch",
                   help="flax = run the text tower on the jax device (TPU):"
                        " CLIP via models/clip.py, RoBERTa/DistilBERT via"
                        " the HF flax classes (weights converted from torch)")
    e.set_defaults(fn=cmd_extract_text)

    ev = sub.add_parser("extract-video",
                        help="video files -> CLIP clip-feature .cfs store")
    ev.add_argument("--videos", required=True, nargs="+",
                    help="clip_id=path pairs, or bare paths (id = basename)")
    ev.add_argument("--out", required=True, help="output .cfs path")
    ev.add_argument("--backend", choices=["clip", "egovlp"], default="clip")
    ev.add_argument("--checkpoint",
                    help="EgoVLP .pth (backend=egovlp; frame rate defaults"
                         " to 1.875 unless --fps is set explicitly)")
    ev.add_argument("--model")
    ev.add_argument("--fps", type=float,
                    help="default: 5 for clip (MAD-style, train_mad.sh),"
                         " 1.875 frames/s for egovlp")
    ev.add_argument("--batch_size", type=int,
                    help="default: 64 frames (clip) / 8 clips (egovlp —"
                         " larger batches thrash HBM, docs/RESULTS.md)")
    ev.add_argument("--device", default="cpu")
    ev.add_argument("--engine", choices=["torch", "flax"], default="torch",
                    help="flax = run the CLIP tower on the jax device (TPU)")
    ev.set_defaults(fn=cmd_extract_video)

    c = sub.add_parser("convert-store", help="features -> packed .cfs store")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--format", choices=["lmdb", "h5", "npy_dir", "pt_dir"],
                   required=True)
    c.add_argument("--array_key", default="features")
    c.set_defaults(fn=cmd_convert_store)

    args = p.parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if (args.cmd in ("train", "infer", "serve", "demo", "extract-video",
                     "extract-text")
            and not getattr(args, "distributed", False)
            and "JAX_COMPILATION_CACHE_DIR" not in os.environ):
        # --distributed defers this to cmd_train: jax.default_backend()
        # initializes the XLA backend, and jax.distributed.initialize()
        # hard-fails once that has happened
        import jax

        # namespace the default cache by backend AND host machine: a shared
        # dir would hand TPU-compiled executables to CPU processes, and
        # XLA:CPU AOT entries from a host with different vector features
        # can SIGILL (utils/cache.py)
        from cone_tpu.utils.cache import jax_cache_dir

        cache = os.environ.get(
            "CONE_TPU_JAX_CACHE", jax_cache_dir(jax.default_backend()))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    args.fn(args)


if __name__ == "__main__":
    main()
