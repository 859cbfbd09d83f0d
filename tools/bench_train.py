"""Training-step throughput benchmark (full-size Ego4D config) on TPU.

    python tools/bench_train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(compute_dtype="float32"):
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import ConeConfig, DataConfig, ModelConfig, TrainConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.data.dataset import TrainLoader
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.train.optim import make_optimizer
    from cone_tpu.train.step import make_train_step

    dim = 256
    cfg = ConeConfig(
        # fp32 is the reference-parity default; bf16 (--set
        # model.compute_dtype=bfloat16 in the CLI) is 7.3x faster on v5e
        # (42.6 -> 5.8 ms/step) with closely tracking losses — the MXU is
        # 4x wider in bf16 and fp32 matmuls emulate via bf16x3 passes.
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype=compute_dtype),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535),
        train=TrainConfig(bsz=32),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=8, queries_per_video=16,
                                ctx_l_range=(900, 1200), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=cfg.train.bsz, seed=0)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    rng = jax.random.PRNGKey(0)

    batches = list(loader.epoch(0))
    print(f"devices: {jax.devices()}; bsz={cfg.train.bsz}; "
          f"{len(batches)} steps/epoch", file=sys.stderr)

    # warmup both adapter variants
    t0 = time.time()
    params, opt_state, m = step(params, opt_state, batches[0], rng, False)
    params, opt_state, m = step(params, opt_state, batches[0], rng, True)
    jax.block_until_ready(m["loss_overall"])
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    # host-sampling time (the reference's dataloading meter)
    t0 = time.time()
    _ = list(loader.epoch(1))
    host_dt = (time.time() - t0) / len(batches)

    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    # pre-stage batches in HBM: the timed region is pure device step time.
    # (Feeding host numpy batches instead costs the tunnel H2D per step —
    # measured ~170 ms/step through the ~34 ms-latency tunnel; on a local
    # TPU host the prefetch thread hides the copy, see train/loop.py.)
    dev_batches = jax.device_put(batches)
    tunnel_sync(dev_batches)
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(3):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, b, sub, True)
            n += 1
    # tunnel_sync, not block_until_ready: the tunnel's block is a no-op
    # fence (utils/perf.py). The step chain is serialized through params
    # anyway, but the final step still needs a real completion fence.
    tunnel_sync(m["loss_overall"])
    dt = (time.time() - t0 - lat) / n
    print(f"device step: {dt * 1e3:.1f} ms -> {cfg.train.bsz / dt:.0f} samples/s",
          file=sys.stderr)
    print(f"host sampling: {host_dt * 1e3:.1f} ms/batch (overlappable)",
          file=sys.stderr)

    import json

    from cone_tpu.utils.perf import train_perf_report

    rep = train_perf_report(cfg, cfg.train.bsz / dt, adapter_on=True)
    print(f"train MFU: {rep['train_mfu'] * 100:.1f}% "
          f"({rep['flops_per_sample'] / 1e9:.2f} GFLOP/sample, "
          f"{cfg.model.compute_dtype} peak)", file=sys.stderr)
    print(json.dumps({
        "metric": f"train_samples_per_sec_{compute_dtype}",
        "value": round(cfg.train.bsz / dt, 1),
        "unit": "samples/sec",
        **rep,
    }))


if __name__ == "__main__":
    for dt_ in (sys.argv[1:] or ["float32", "bfloat16"]):
        main(dt_)
