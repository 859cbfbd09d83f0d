"""Capture a jax.profiler trace of the fused inference pipeline on TPU.

    python tools/profile_infer.py [outdir]

Open the trace with tensorboard/xprof. Replaces the reference's wall-clock
prints (cone/inference.py:236,317) with real device timelines.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cone_tpu_profile"
    import jax

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.init import build_model_and_params

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16"),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535,
                        topk_window=20, max_ctx_l=2304),
        eval=EvalConfig(query_chunk=16),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=16,
                                ctx_l_range=(2240, 2245), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, cfg)
    pipe.run(host_postproc=False, fused=True)  # compile

    with jax.profiler.trace(outdir):
        for _ in range(3):
            pipe.run(host_postproc=False, fused=True)
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
