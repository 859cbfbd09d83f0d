"""2D-TAN serving throughput on the real TPU (the alternate base model).

Same serving regime as bench.py but through TanInferencePipeline: fused
coarse->fine dispatches per (video, query-chunk), corpus HBM-resident,
device time fenced with tunnel_sync. Geometry = the canonical Ego4D yaml
(window 64, 64x64 map, stride-1 frame pooling; tan_ego4d_config) and the
MAD yaml (window 128, TARGET_STRIDE 2 -> 64x64 map, adapter off), with one
synthetic-data concession: token features are 256/512-d (the matching
branch needs text CLS dim == appearance dim in the synthetic corpus), so
only the first LSTM layer's input GEMM differs from the RoBERTa-768
reference geometry. The model runs fp32 (the TAN stack has no
compute_dtype knob — the reference trains it fp32).

    python tools/bench_tan.py        # no JAX_PLATFORMS override (axon)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import (EvalConfig, tan_ego4d_config,
                                 tan_mad_config)
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import make_pipeline
    from cone_tpu.train.loop import build_family
    from cone_tpu.utils.perf import device_time_fused

    print(f"devices: {jax.devices()}", file=sys.stderr)

    # 2D-TAN is ~2-3 orders of magnitude more FLOPs per query than the
    # Moment-DETR head (each of the topk windows runs 4 9x9 conv layers
    # over a 64x64x256 proposal map), so the in-flight load is much
    # smaller than bench.py's — a pass is seconds, not milliseconds
    scales = {
        "ego4d": dict(
            cfg=tan_ego4d_config(), dim=256, ctx=(2240, 2245), n_videos=2,
            qpv=32, buckets=(), qc=8),
        "mad": dict(
            cfg=tan_mad_config(), dim=512, ctx=(35995, 36000), n_videos=1,
            qpv=16, buckets=(8192, 16384, 24576, 36864, 49152), qc=8),
    }
    for name, s in scales.items():
        cfg = s["cfg"]
        cfg = cfg.replace(
            # synthetic corpus: token dim == cls dim == appearance dim
            tan=dataclasses.replace(cfg.tan, t_feat_dim=s["dim"]),
            model=dataclasses.replace(cfg.model, t_feat_dim=s["dim"]),
            eval=EvalConfig(nms_thd=0.5, max_after_nms=5,
                            query_chunk=s["qc"], video_batch=1,
                            ctx_buckets=s["buckets"], corpus_dtype="int8"),
        )
        ds = make_synthetic_dataset(
            cfg.data, n_videos=s["n_videos"], queries_per_video=s["qpv"],
            ctx_l_range=s["ctx"], dim=s["dim"], q_len_range=(8, 20), seed=0)
        n_queries = len(ds)
        model, params = build_family(cfg, seed=0)
        pipe = make_pipeline(model, params, ds, cfg)

        t0 = time.time()
        pipe.run(host_postproc=False, fused=True)
        print(f"{name}: warmup (compile) {time.time() - t0:.1f}s",
              file=sys.stderr)
        wall_best = float("inf")
        for _ in range(3):
            t0 = time.time()
            pipe.run(host_postproc=False, fused=True)
            wall_best = min(wall_best, time.time() - t0)
        dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=5)
        print(f"{name}: {n_queries} queries x {s['n_videos']} videos "
              f"({s['ctx'][1]} clips, {s['dim']}-d) | device "
              f"{per_pass * 1e3:.1f} ms/pass -> {1 / dev_s_per_q:.0f} q/s | "
              f"wall {n_queries / wall_best:.0f} q/s")


if __name__ == "__main__":
    main()
