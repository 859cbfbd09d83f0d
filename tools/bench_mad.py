"""MAD movie-scale inference benchmark (BASELINE.json config #5).

2-hour movies at 5 fps (36k clips, 512-d CLIP features), window 125,
top-30 windows per query — thousands of windows per movie — through the
fused coarse-to-fine pipeline. Run on TPU:

    python tools/bench_mad.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.init import build_model_and_params

    dim = 512
    ctx = 36000  # 2 h @ 5 fps
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=125, max_q_l=20,
                          compute_dtype="bfloat16"),
        # max_ctx_l mirrors the mad preset's worst case; ctx_buckets let the
        # standard 2 h movie pad to 36864 instead (VERDICT r1 #3)
        data=DataConfig(dset_name="mad", max_v_l=125, clip_length=0.2,
                        topk_window=30, max_q_l=20, max_ctx_l=65536),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=16,
                        video_batch=2,
                        ctx_buckets=(8192, 16384, 24576, 36864, 49152)),
    )
    # serving-realistic in-flight load (see bench.py): 256 queries over the
    # two resident movies. vb sweep (RESULTS.md): vmap lanes cost device
    # time (vb=1: 981 q/s, vb=8: 747) but per-group host staging costs wall
    # on the tunnel; vb=2 is the wall-clock sweet spot (670 q/s)
    n_videos, qpv = 2, 128
    ds = make_synthetic_dataset(
        cfg.data, n_videos=n_videos, queries_per_video=qpv,
        ctx_l_range=(ctx - 5, ctx), dim=dim, q_len_range=(8, 20), seed=0,
    )
    n_queries = len(ds)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"{n_videos} movies x {ctx} clips x {dim}d, {n_queries} queries,"
          f" {-(-ctx // (cfg.data.max_v_l // 2)) + 1} windows/movie",
          file=sys.stderr)

    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, cfg)

    t0 = time.time()
    pipe.run(host_postproc=False, fused=True)
    print(f"warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        subs, ranklists = pipe.run(host_postproc=False, fused=True)
        best = min(best, time.time() - t0)
        print(f"run: {best:.3f}s -> {n_queries / best:.2f} q/s", file=sys.stderr)

    # A/B in ONE process (tunnel latency varies between sessions): the same
    # corpus forced to the 65536 worst-case pad vs the bucketed pipeline
    import dataclasses as dc

    from cone_tpu.utils.perf import device_time_fused, perf_report

    dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=3)
    perf = perf_report(cfg, 36864, n_queries, dev_s_per_q,
                       wall_qps=n_queries / best)
    print(f"bucketed device-only: {per_pass * 1e3:.1f} ms/pass"
          f" -> {perf['device_qps']} q/s | {perf['flops_per_query'] / 1e9:.2f}"
          f" GFLOP/q (fine {perf['flops_fine_frac'] * 100:.0f}%)"
          f" | MFU {perf['mfu'] * 100:.2f}% | HBM {perf['hbm_util'] * 100:.1f}%",
          file=sys.stderr)

    cfg_nb = cfg.replace(eval=dc.replace(cfg.eval, ctx_buckets=()))
    pipe_nb = InferencePipeline(model, params, ds, cfg_nb)
    dev_nb, pass_nb = device_time_fused(pipe_nb, n_queries, repeats=3)
    print(f"unbucketed (pad 65536) device-only: {pass_nb * 1e3:.1f} ms/pass"
          f" -> {1 / dev_nb:.2f} q/s"
          f" (bucketing speedup {dev_nb / dev_s_per_q:.2f}x)", file=sys.stderr)
    del pipe_nb

    # corpus-residency A/B (same process): bf16 / int8 corpus vs fp32 —
    # 2x / 4x more movies resident per chip; throughput should hold since
    # decode fuses into the program and the fine stage is FLOPs-bound
    quant = {}
    for dt in ("bfloat16", "int8"):
        cfg_q = cfg.replace(eval=dc.replace(cfg.eval, corpus_dtype=dt))
        pipe_q = InferencePipeline(model, params, ds, cfg_q)
        dev_q, pass_q = device_time_fused(pipe_q, n_queries, repeats=3)
        res_mb = sum(
            v.nbytes for c in ds.video_ids
            for v in pipe_q._device_video(c)[:2]) / 1e6
        quant[dt] = dict(device_qps=round(1 / dev_q, 2),
                         resident_mb=round(res_mb, 1))
        print(f"corpus {dt}: {pass_q * 1e3:.1f} ms/pass -> {1 / dev_q:.2f}"
              f" q/s, corpus resident {res_mb:.0f} MB"
              f" (fp32 speed x{dev_s_per_q / dev_q:.2f})", file=sys.stderr)
        del pipe_q

    res_f32 = sum(v.nbytes for c in ds.video_ids
                  for v in pipe._device_video(c)[:2]) / 1e6

    # mad_scratch geometry in the same process (nheads=2 + sublane-aligned
    # sequence, config.py mad_scratch_config): the from-scratch serving
    # number that stacks the two measured geometry wins
    cfg_s = cfg.replace(model=dc.replace(cfg.model, nheads=2,
                                         seq_pad_multiple=16),
                        eval=dc.replace(cfg.eval, query_chunk=8,
                                        video_batch=1,
                                        corpus_dtype="int8"))
    model_s, params_s = build_model_and_params(cfg_s.model, seed=0)
    pipe_s = InferencePipeline(model_s, params_s, ds, cfg_s)
    dev_s, pass_s = device_time_fused(pipe_s, n_queries, repeats=3)
    print(f"mad_scratch geometry (nheads=2 + seqpad + qc=8 + int8):"
          f" {pass_s * 1e3:.1f}"
          f" ms/pass -> {1 / dev_s:.2f} q/s"
          f" (x{dev_s_per_q / dev_s:.2f} vs reference geometry)",
          file=sys.stderr)
    del pipe_s

    import json

    print(json.dumps({
        "metric": "mad_infer_qps", "value": round(n_queries / best, 2),
        "unit": "queries/sec",
        "unbucketed_device_qps": round(1 / dev_nb, 2),
        "corpus_resident_mb_f32": round(res_f32, 1),
        "corpus_quant": quant,
        "scratch_geometry_device_qps": round(1 / dev_s, 2),
        **perf,
    }))


if __name__ == "__main__":
    main()
