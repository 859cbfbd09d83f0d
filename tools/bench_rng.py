"""Dropout-RNG A/B on the real TPU: threefry vs rbg training step.

Threefry random-bit generation (jax's default, counter-based) was measured
at 62% of the bf16 training *forward* at bsz 128 (1.10 ms deterministic /
2.93 ms threefry dropout / 1.62 ms rbg); XLA's RngBitGenerator ("rbg")
generates statistically-equivalent dropout masks in hardware. This tool
quantifies the end-to-end train-step delta — same process, same batches,
same fencing discipline as bench_train_bsz.py.

MEASURED RESULT (v5e, two sessions): the forward-only win INVERTS in the
full fwd+bwd step — threefry 16.7 ms/step vs rbg 59-64 ms/step (0.26-0.28x).
The RngBitGenerator HLO acts as a fusion barrier in the larger gradient
program, where threefry's pure-arithmetic bit stream fuses into neighboring
elementwise work. Honest rejection: all presets keep threefry; the
train.rng_impl knob remains for experimentation.

    python tools/bench_rng.py [bsz]     # default 128
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(bsz: int, impl: str):
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
        train=TrainConfig(bsz=bsz, rng_impl=impl),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=4,
                                queries_per_video=max(16, bsz // 2),
                                ctx_l_range=(900, 1200), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=bsz, seed=0)
    tx = make_optimizer(params, cfg.train, max(1, loader.steps_per_epoch()))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    rng = (jax.random.PRNGKey(0) if impl == "threefry"
           else jax.random.key(0, impl=impl))
    batches = list(loader.epoch(0))[:4]

    params, opt_state, m = step(params, opt_state, batches[0], rng, True)
    tunnel_sync(m["loss_overall"])

    dev_batches = jax.device_put(batches)
    tunnel_sync(dev_batches)
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(max(3, 48 // len(batches))):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, b, sub, True)
            n += 1
    tunnel_sync(m["loss_overall"])
    dt = max(1e-9, (time.time() - t0 - lat) / n)
    rep = train_perf_report(cfg, bsz / dt, adapter_on=True)
    print(f"  rng_impl={impl:9s} bsz={bsz}: {dt * 1e3:7.2f} ms/step"
          f" -> {bsz / dt:7.0f} samples/s | MFU {rep['train_mfu'] * 100:.1f}%"
          f" | loss {float(m['loss_overall']):.4f}", flush=True)
    return bsz / dt


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    base = measure(bsz, "threefry")
    fast = measure(bsz, "rbg")
    print(f"  rbg vs threefry: {fast / base:.2f}x", flush=True)


if __name__ == "__main__":
    main()
