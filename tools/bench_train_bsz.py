"""Training-step batch-size sweep (bf16, ego4d geometry) on the real TPU.

The reference trains at bsz 32 (train_ego4d.sh); at that size the v5e MXU
is latency-bound (~5% bf16 MFU). This sweep quantifies the from-scratch
lever the framework adds: crank train.bsz (and scale lr accordingly) and
the same step program amortizes dispatch + pipeline bubbles.

    python tools/bench_train_bsz.py [bsz ...]     # default 32 128 512
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(bsz: int):
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
                          compute_dtype="bfloat16", seq_pad_multiple=16),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535),
        train=TrainConfig(bsz=bsz),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=4,
                                queries_per_video=max(16, bsz // 2),
                                ctx_l_range=(900, 1200), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=bsz, seed=0)
    tx = make_optimizer(params, cfg.train, max(1, loader.steps_per_epoch()))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    rng = jax.random.PRNGKey(0)
    batches = list(loader.epoch(0))[:4]

    params, opt_state, m = step(params, opt_state, batches[0], rng, True)
    tunnel_sync(m["loss_overall"])

    dev_batches = jax.device_put(batches)
    tunnel_sync(dev_batches)
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(max(3, 24 // len(batches))):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, b, sub, True)
            n += 1
    tunnel_sync(m["loss_overall"])
    dt = (time.time() - t0 - lat) / n
    rep = train_perf_report(cfg, bsz / dt, adapter_on=True)
    print(f"bsz {bsz:4d}: {dt * 1e3:7.2f} ms/step -> {bsz / dt:7.0f} samples/s"
          f" | MFU {rep['train_mfu'] * 100:.1f}% bf16", flush=True)


def main():
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for bsz in [int(x) for x in (sys.argv[1:] or [32, 128, 512])]:
        measure(bsz)


if __name__ == "__main__":
    main()
