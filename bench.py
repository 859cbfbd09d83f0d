"""Benchmark: compound guard over every flagship path.

Primary workload (BASELINE.json config #3): Ego4D-sized synthetic features —
20-min videos at 1.87 fps (~2244 clips, 256-d), window=90, top-20 windows, 5
moment queries, NMS 0.5 — run through the complete pipeline (coarse window
ranking, batched fine forward, on-device fusion + NMS).

Prints ONE json line:
    {"metric": "ego4d_infer_qps", "value": <queries/sec>, "unit":
     "queries/sec", "vs_baseline": <speedup vs reference-style loop>, ...}

vs_baseline is measured on the SAME chip: the reference architecture runs
one window per forward in a Python loop (cone/inference.py:40-67 with
eval_bsz queries => bsz window-batches of ragged size; the dominant cost is
topk sequential forwards per query). We time that loop shape and report the
ratio — i.e. the speedup attributable to the windows-as-batch-axis design.

The same line also carries compact fixed-geometry sub-benches so a
regression in ANY flagship path shows in BENCH_r{N}.json, not just Ego4D
serving: `mad_device_qps` (movie-scale fused inference, scaled-down from
tools/bench_mad.py), `tan_device_qps` (the 2D-TAN family,
tools/bench_tan.py), and `train_samples_per_sec`/`train_mfu` (the bf16
training step, tools/bench_train.py). All device-side numbers are fenced
with tunnel_sync in THIS process, so round-to-round comparisons are honest;
device_qps-style metrics are tunnel-independent and are the ones to guard.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_mad_small():
    """Fixed MAD-geometry pass, scaled down (1 movie, 64 queries, one ctx
    bucket) from tools/bench_mad.py so the guard stays cheap. Guard metric:
    mad_device_qps."""
    import time

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.utils.perf import device_time_fused

    dim, ctx = 512, 36000  # 2 h @ 5 fps, CLIP ViT-B/32 dims
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=125, max_q_l=20,
                          compute_dtype="bfloat16"),
        data=DataConfig(dset_name="mad", max_v_l=125, clip_length=0.2,
                        topk_window=30, max_q_l=20, max_ctx_l=65536),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=16,
                        video_batch=1, ctx_buckets=(36864,)),
    )
    ds = make_synthetic_dataset(
        cfg.data, n_videos=1, queries_per_video=64,
        ctx_l_range=(ctx - 5, ctx), dim=dim, q_len_range=(8, 20), seed=0)
    n_queries = len(ds)
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, cfg)
    t0 = time.time()
    pipe.run(host_postproc=False, fused=True)
    log(f"mad: warmup {time.time() - t0:.1f}s")
    wall = float("inf")
    for _ in range(2):
        t0 = time.time()
        pipe.run(host_postproc=False, fused=True)
        wall = min(wall, time.time() - t0)
    dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=3)
    log(f"mad: device {per_pass * 1e3:.1f} ms/pass -> {1 / dev_s_per_q:.1f}"
        f" q/s | wall {n_queries / wall:.1f} q/s")
    del pipe
    return {
        "mad_infer_qps": round(n_queries / wall, 2),
        "mad_device_qps": round(1 / dev_s_per_q, 2),
    }


def bench_tan_small():
    """2D-TAN family (tan_ego4d geometry), scaled down from
    tools/bench_tan.py. Guard metric: tan_device_qps."""
    import dataclasses as dc
    import time

    from cone_tpu.config import EvalConfig, tan_ego4d_config
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import make_pipeline
    from cone_tpu.train.loop import build_family
    from cone_tpu.utils.perf import device_time_fused, tan_perf_report

    dim = 256
    cfg = tan_ego4d_config()
    cfg = cfg.replace(
        # synthetic corpus: token dim == cls dim == appearance dim
        tan=dc.replace(cfg.tan, t_feat_dim=dim),
        model=dc.replace(cfg.model, t_feat_dim=dim),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=8,
                        video_batch=1, corpus_dtype="int8"),
    )
    ds = make_synthetic_dataset(
        cfg.data, n_videos=1, queries_per_video=16,
        ctx_l_range=(2240, 2245), dim=dim, q_len_range=(8, 20), seed=0)
    n_queries = len(ds)
    model, params = build_family(cfg, seed=0)
    pipe = make_pipeline(model, params, ds, cfg)
    t0 = time.time()
    pipe.run(host_postproc=False, fused=True)
    log(f"tan: warmup {time.time() - t0:.1f}s")
    wall = float("inf")
    for _ in range(2):
        t0 = time.time()
        pipe.run(host_postproc=False, fused=True)
        wall = min(wall, time.time() - t0)
    dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=3)
    rep = tan_perf_report(cfg, dev_s_per_q)
    log(f"tan: device {per_pass * 1e3:.1f} ms/pass -> {1 / dev_s_per_q:.1f}"
        f" q/s | wall {n_queries / wall:.1f} q/s"
        f" | {rep['tan_flops_per_query'] / 1e12:.2f} TFLOP/q"
        f" (map convs {rep['tan_map_conv_frac'] * 100:.1f}%)"
        f" | MFU {rep['tan_mfu'] * 100:.1f}%")
    del pipe
    return {
        "tan_infer_qps": round(n_queries / wall, 2),
        "tan_device_qps": round(1 / dev_s_per_q, 2),
        "tan_mfu": rep["tan_mfu"],
        "tan_flops_per_query": rep["tan_flops_per_query"],
    }


def _bench_train_one(bsz: int, seq_pad: int, tag: str):
    """One bf16 training-step measurement at the full Ego4D geometry
    (tools/bench_train.py recipe, fewer steps)."""
    import time

    import jax

    from cone_tpu.config import ConeConfig, DataConfig, ModelConfig, TrainConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.data.dataset import TrainLoader
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.train.optim import make_optimizer
    from cone_tpu.train.step import make_train_step
    from cone_tpu.utils.perf import sync_latency, train_perf_report, tunnel_sync

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16", seq_pad_multiple=seq_pad),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535),
        train=TrainConfig(bsz=bsz),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=4,
                                queries_per_video=max(16, bsz // 2),
                                ctx_l_range=(900, 1200), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=cfg.train.bsz, seed=0)
    tx = make_optimizer(params, cfg.train, max(1, loader.steps_per_epoch()))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    rng = jax.random.PRNGKey(0)
    batches = list(loader.epoch(0))[:4]

    t0 = time.time()
    params, opt_state, m = step(params, opt_state, batches[0], rng, True)
    tunnel_sync(m["loss_overall"])
    log(f"train[{tag}]: compile {time.time() - t0:.1f}s")

    dev_batches = jax.device_put(batches)
    tunnel_sync(dev_batches)
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(max(5, 20 // len(dev_batches))):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, b, sub, True)
            n += 1
    tunnel_sync(m["loss_overall"])
    dt = (time.time() - t0 - lat) / n
    rep = train_perf_report(cfg, cfg.train.bsz / dt, adapter_on=True)
    log(f"train[{tag}]: bsz {bsz}, {dt * 1e3:.2f} ms/step ->"
        f" {cfg.train.bsz / dt:.0f} samples/s"
        f" | MFU {rep['train_mfu'] * 100:.1f}% (bf16 peak,"
        f" {rep['flops_per_sample'] / 1e9:.2f} GFLOP/sample)")
    return rep


def bench_train_small():
    """bf16 training step at the full Ego4D geometry, both recipes:

      * reference recipe (bsz 32, the reference's train_ego4d.sh batch
        size) -> train_samples_per_sec / train_mfu;
      * throughput-optimal recipe (bsz 128 + seq_pad 16, the
        tools/bench_train_bsz.py sweep optimum; NOT a preset default —
        the round-5 loss-tracking A/B rejected it at a fixed sample
        budget, tools/bench_train_recipe_ab.py)
        -> train_samples_per_sec_opt / train_mfu_opt.
    """
    ref = _bench_train_one(32, 1, "ref-recipe")
    opt = _bench_train_one(128, 16, "opt-recipe")
    return {
        "train_samples_per_sec": ref["train_samples_per_sec"],
        "train_mfu": ref["train_mfu"],
        "train_flops_per_sample": ref["flops_per_sample"],
        "train_samples_per_sec_opt": opt["train_samples_per_sec"],
        "train_mfu_opt": opt["train_mfu"],
    }


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.init import build_model_and_params

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16",
                          # sublane-aligned sequence (110 -> 112): +4.8% on
                          # the fine forward, bitwise-identical (RESULTS.md)
                          seq_pad_multiple=16),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535,
                        topk_window=20, max_ctx_l=2304),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=32,
                        video_batch=1),
    )
    # serving-realistic in-flight load: 1024 queries against the resident
    # 4-video corpus. One (video, 32-query chunk) work item per dispatch:
    # the vb sweep showed vmap lanes COST device time (vb=1 is 28% faster
    # than vb=8 — XLA optimizes the unbatched program better), and with the
    # batched device_get in run_fused the tunnel round trips pipeline, so
    # wall-clock no longer needs big dispatches (RESULTS.md).
    n_videos, qpv = 4, 256
    ds = make_synthetic_dataset(
        cfg.data, n_videos=n_videos, queries_per_video=qpv,
        ctx_l_range=(2240, 2245), dim=dim, q_len_range=(8, 20), seed=0,
    )
    n_queries = len(ds)
    log(f"devices: {jax.devices()}")
    log(f"queries: {n_queries}, videos: {n_videos}")

    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, cfg)

    # warmup (compile)
    t0 = time.time()
    subs, ranklists = pipe.run(host_postproc=False, fused=True)
    log(f"warmup (compile) run: {time.time() - t0:.1f}s")

    # cold start: host normalize + pad + H2D upload of the whole corpus
    pipe.clear_cache()
    t0 = time.time()
    pipe.run(host_postproc=False, fused=True)
    log(f"cold run (corpus upload included): {time.time() - t0:.3f}s")

    # steady state: corpus features HBM-resident (the serving regime; the
    # reference likewise RAM-caches all videos up front), per-query work =
    # coarse ranking + fine forward + fusion + NMS. Tunnel throughput
    # fluctuates in minutes-long patches (same build measured 0.50-3.5 s
    # per identical run) — a second block of runs happens after the
    # device-only section below so best-of spans a wider time window.
    best = float("inf")

    def wall_runs(n):
        nonlocal best
        for _ in range(n):
            t0 = time.time()
            pipe.run(host_postproc=False, fused=True)
            dt = time.time() - t0
            best = min(best, dt)
            log(f"pipeline run: {dt:.3f}s -> {n_queries / dt:.2f} q/s")

    wall_runs(5)
    qps = n_queries / best

    # ---- reference-shape baseline: one window per forward, Python loop ----
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    appear, motion = ds.video_features(ex.clip_id)
    w = motion[: cfg.data.max_v_l]

    @jax.jit
    def one_window(params, tok, tmask, vid, vmask):
        out = model.apply({"params": params}, tok, tmask, vid, vmask,
                          deterministic=True)
        return out["pred_spans"], out["pred_logits"]

    tokp = np.zeros((1, cfg.data.max_q_l, dim), np.float32)
    tokp[0, : len(tok)] = tok
    tmask = np.zeros((1, cfg.data.max_q_l), np.float32)
    tmask[0, : len(tok)] = 1
    vid = jnp.asarray(w[None])
    vmask = jnp.ones((1, cfg.data.max_v_l), jnp.float32)
    tokj, tmaskj = jnp.asarray(tokp), jnp.asarray(tmask)

    # ---- device-only accounting: MFU + HBM utilization -------------------
    from cone_tpu.utils.perf import device_time_fused, perf_report

    dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=5)
    perf = perf_report(cfg, cfg.data.max_ctx_l, n_queries, dev_s_per_q,
                       wall_qps=qps)
    log(f"device-only: {per_pass * 1e3:.1f} ms/pass -> {perf['device_qps']} q/s"
        f" | {perf['flops_per_query'] / 1e9:.2f} GFLOP/q"
        f" (fine {perf['flops_fine_frac'] * 100:.0f}%)"
        f" | MFU {perf['mfu'] * 100:.2f}% | HBM {perf['hbm_util'] * 100:.1f}%")

    # device-optimal dispatch size: co-located hosts run query_chunk=16
    # (smaller fused programs optimize better — RESULTS.md qc sweep);
    # qc=32 above is the wall-optimal config for this tunneled host
    import dataclasses as dc

    pipe16 = InferencePipeline(
        model, params, ds,
        cfg.replace(eval=dc.replace(cfg.eval, query_chunk=16)))
    dev16, pass16 = device_time_fused(pipe16, n_queries, repeats=5)
    perf16 = perf_report(cfg, cfg.data.max_ctx_l, n_queries, dev16,
                         wall_qps=qps)
    log(f"device-only qc=16 (co-located config): {pass16 * 1e3:.1f} ms/pass"
        f" -> {perf16['device_qps']} q/s | MFU {perf16['mfu'] * 100:.2f}%")
    del pipe16

    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    # The baseline must keep the reference's ARCHITECTURE: one window per
    # jitted forward, driven by a host loop (cone/inference.py:40-67). An
    # async host loop with a single final fence is the most generous
    # faithful version (the real reference also syncs per batch for host
    # post-processing). Measured as a two-point difference so the fence's
    # 10-80 ms round-trip noise cancels; per-window cost = max(host
    # dispatch rate, device time), which is what gates that loop.
    # (Chaining the windows inside ONE program instead measures ~20 us —
    # but that deletes the dispatch-per-window control flow being modeled.)
    # Two baselines, both keeping the reference loop shape:
    #  * conservative (reported as vs_baseline): window features already
    #    device-resident — generous to the reference, under-counts its cost;
    #  * faithful (vs_baseline_faithful): one window H2D per forward, as
    #    the reference's DataLoader uploads every window batch
    #    (prepare_batch_inputs, ego4d_mad_dataloader.py:347-394). On the
    #    tunnel, small uploads are latency-bound (~4 ms each), so this
    #    ratio is large and session-dependent.
    w_np = np.ascontiguousarray(w[None])

    def baseline_time(iters, upload):
        tunnel_sync(one_window(params, tokj, tmaskj, vid, vmask))
        t0 = time.time()
        for _ in range(iters):
            v = jnp.asarray(w_np) if upload else vid
            r = one_window(params, tokj, tmaskj, v, vmask)
        tunnel_sync(r)
        return time.time() - t0

    def per_window(upload):
        t1 = baseline_time(200, upload)
        t2 = baseline_time(1000, upload)
        return max((t2 - t1) / 800, 1e-9)

    pw_res, pw_h2d = per_window(False), per_window(True)
    # reference cost per query ~= topk sequential window forwards (+ coarse,
    # ignored => baseline flattered)
    baseline_qps = 1.0 / (pw_res * cfg.data.topk_window)
    baseline_faithful_qps = 1.0 / (pw_h2d * cfg.data.topk_window)
    log(f"per-window forward: {pw_res * 1e3:.2f} ms resident / "
        f"{pw_h2d * 1e3:.2f} ms with H2D -> baseline {baseline_qps:.2f} / "
        f"{baseline_faithful_qps:.2f} q/s")

    # ---- compound guard: the other flagship paths, same process ----------
    extra = {}
    for name, fn in (("mad", bench_mad_small), ("tan", bench_tan_small),
                     ("train", bench_train_small)):
        try:
            extra.update(fn())
        except Exception as e:  # a broken sub-bench must not hide the rest
            log(f"{name} sub-bench FAILED: {type(e).__name__}: {e}")
            extra[f"{name}_bench_error"] = f"{type(e).__name__}: {e}"

    # second wall block (see comment above: widen the time window best-of
    # samples from, the tunnel's slow patches last minutes)
    wall_runs(4)
    qps = n_queries / best
    perf["wall_qps"] = round(qps, 2)

    print(json.dumps({
        "metric": "ego4d_infer_qps",
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps / baseline_qps, 2),
        "vs_baseline_faithful": round(qps / baseline_faithful_qps, 2),
        # device-vs-device ratio: fused per-query device time vs the
        # baseline loop's 20 sequential per-window forwards — the ratio
        # least polluted by the tunnel session's dispatch-rate patchiness
        # (wall vs_baseline has varied 15-59x across sessions from the
        # BASELINE side alone; see RESULTS.md)
        "vs_baseline_device": round(perf["device_qps"] / baseline_qps, 2),
        # the co-located (device-optimal) dispatch size, qc=16
        "device_qps_best": perf16["device_qps"],
        "mfu_best": perf16["mfu"],
        # device_qps is the stable cross-session number (tunnel-independent)
        **perf,
        # compound guard: MAD / TAN / training sub-benches (device-side
        # numbers are the ones to compare round-to-round)
        **extra,
    }))


if __name__ == "__main__":
    main()
