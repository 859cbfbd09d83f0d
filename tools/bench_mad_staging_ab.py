"""MAD wall/device gap: one-process A/B of the stacked-group cache.

BENCH_r04: mad wall 378.9 q/s vs device 1048.9 q/s = 36%, the worst
wall/device ratio in the bench (ego4d: 48%). Host input staging already
overlaps execution (run_fused prefetch thread); what remained serial was
the DEVICE-side re-stacking of the full feature streams every run
(jnp.stack of 2 x 75 MB per group at MAD scale — one dispatch + copy per
array per group) plus their enqueue latency over the tunnel. The
stacked-group LRU (eval/pipeline.py _fused_groups) reuses those tensors
across runs; this A/B measures wall-clock with the cache off vs on in ONE
process (tunnel latency varies between sessions), at the exact bench.py
MAD geometry.

    python tools/bench_mad_staging_ab.py      # no JAX_PLATFORMS override
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.utils.perf import device_time_fused

    print(f"devices: {jax.devices()}", file=sys.stderr)

    dim, ctx = 512, 36000  # bench.py bench_mad_small geometry
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
    print(f"warmup {time.time() - t0:.1f}s", file=sys.stderr)

    def wall(tag, n=6):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            pipe.run(host_postproc=False, fused=True)
            best = min(best, time.time() - t0)
        print(f"{tag}: best {best * 1e3:.1f} ms -> {n_queries / best:.1f}"
              f" q/s wall", file=sys.stderr)
        return n_queries / best

    # interleave the two arms twice: the tunnel has minutes-long slow
    # patches, so A-then-B alone can be confounded by a patch boundary
    pipe.stack_cache = False
    off1 = wall("cache OFF (r4 behavior)  #1")
    pipe.stack_cache = True
    on1 = wall("cache ON                  #1")
    pipe.stack_cache = False
    off2 = wall("cache OFF (r4 behavior)  #2")
    pipe.stack_cache = True
    on2 = wall("cache ON                  #2")

    dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=3)
    dev_qps = 1 / dev_s_per_q
    off, on = max(off1, off2), max(on1, on2)
    print(f"\nmad staging A/B (one process): wall off {off:.1f} / on "
          f"{on:.1f} q/s ({on / off:.2f}x) | device {dev_qps:.1f} q/s | "
          f"wall/device off {off / dev_qps * 100:.0f}% -> on "
          f"{on / dev_qps * 100:.0f}%")


if __name__ == "__main__":
    main()
