"""Ablation profile of the training step on the real chip.

Times, in ONE process with the bench fencing discipline, the bf16 train
step at the throughput-optimal geometry (bsz 128, seq-padded 16) while
switching off one component at a time:

    full         - the shipping step (pos fwd + neg fwd + criterion + aux
                   + AdamW)
    no_aux       - criterion skips the dec_layers-1 auxiliary matcher/loss
                   stacks (loss.aux_loss=False)
    no_neg       - no negative-window forward (loss.neg_loss=False)
    dummy_loss   - grads of sum(pred_spans)+sum(saliency): forward+bwd cost
                   without any criterion
    fwd_only     - positive forward, no grad

The deltas bound where the 17.5 ms/step goes (RESULTS.md round-4 bsz
sweep): criterion = full - dummy_loss - neg share, etc. Reference surface:
cone/train.py:53-89 (the reference never profiled its step at all).

    python tools/profile_train_ablate.py [bsz]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(bsz: int, *, aux: bool, neg: bool):
    from cone_tpu.config import ConeConfig, DataConfig, ModelConfig, TrainConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.data.dataset import TrainLoader
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.train.optim import make_optimizer
    from cone_tpu.train.step import make_train_step

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16", seq_pad_multiple=16),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535),
        train=TrainConfig(bsz=bsz),
    )
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, aux_loss=aux,
                                               neg_loss=neg))
    ds = make_synthetic_dataset(cfg.data, n_videos=4,
                                queries_per_video=max(16, bsz // 2),
                                ctx_l_range=(900, 1200), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=bsz, seed=0)
    tx = make_optimizer(params, cfg.train, max(1, loader.steps_per_epoch()))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    batches = list(loader.epoch(0))[:4]
    return cfg, model, params, opt_state, step, batches, tx


def time_steps(step, params, opt_state, batches, label):
    import jax

    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    rng = jax.random.PRNGKey(0)
    params, opt_state, m = step(params, opt_state, batches[0], rng, True)
    tunnel_sync(m["loss_overall"])
    dev_batches = jax.device_put(batches)
    tunnel_sync(dev_batches)
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(12):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, b, sub, True)
            n += 1
    tunnel_sync(m["loss_overall"])
    dt = max(1e-9, (time.time() - t0 - lat) / n)
    print(f"  {label:12s}: {dt * 1e3:7.2f} ms/step", flush=True)
    return dt


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}  bsz={bsz}", flush=True)

    cfg, model, params, opt_state, step, batches, tx = build(
        bsz, aux=True, neg=True)
    t_full = time_steps(step, params, opt_state, batches, "full")

    _, _, p2, o2, step_na, b2, _ = build(bsz, aux=False, neg=True)
    t_noaux = time_steps(step_na, p2, o2, b2, "no_aux")

    _, _, p3, o3, step_nn, b3, _ = build(bsz, aux=True, neg=False)
    t_noneg = time_steps(step_nn, p3, o3, b3, "no_neg")

    # the shipping step donates params/opt_state — rebuild fresh ones
    cfg, model, params, opt_state, _, batches, tx = build(
        bsz, aux=True, neg=True)

    # dummy loss: forward + bwd + AdamW, zero criterion
    def dummy_loss(params, batch, rng):
        d1, _ = jax.random.split(rng)
        out = model.apply({"params": params},
                          batch["query_tokens"], batch["query_mask"],
                          batch["pos_motion"], batch["pos_mask"],
                          deterministic=False, rngs={"dropout": d1})
        return (jnp.sum(out["pred_spans"].astype(jnp.float32))
                + jnp.sum(out["saliency_scores"].astype(jnp.float32)))

    @jax.jit
    def dummy_step(params, opt_state, batch, rng):
        g = jax.grad(dummy_loss)(params, batch, rng)
        updates, opt_state = tx.update(g, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

    from cone_tpu.utils.perf import sync_latency, tunnel_sync
    rng = jax.random.PRNGKey(0)
    p, o = dummy_step(params, opt_state, batches[0], rng)
    tunnel_sync(jax.tree.leaves(p)[0])
    dev_batches = jax.device_put(batches)
    tunnel_sync(dev_batches)
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(12):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            p, o = dummy_step(p, o, b, sub)
            n += 1
    tunnel_sync(jax.tree.leaves(p)[0])
    t_dummy = max(1e-9, (time.time() - t0 - lat) / n)
    print(f"  {'dummy_loss':12s}: {t_dummy * 1e3:7.2f} ms/step", flush=True)

    @jax.jit
    def fwd(params, batch, rng):
        d1, _ = jax.random.split(rng)
        return model.apply({"params": params},
                           batch["query_tokens"], batch["query_mask"],
                           batch["pos_motion"], batch["pos_mask"],
                           deterministic=False, rngs={"dropout": d1})

    out = fwd(params, batches[0], rng)
    tunnel_sync(out["pred_spans"])
    lat = sync_latency()
    t0 = time.time()
    n = 0
    for _ in range(12):
        for b in dev_batches:
            rng, sub = jax.random.split(rng)
            out = fwd(params, b, sub)
            n += 1
    tunnel_sync(out["pred_spans"])
    t_fwd = max(1e-9, (time.time() - t0 - lat) / n)
    print(f"  {'fwd_only':12s}: {t_fwd * 1e3:7.2f} ms/step", flush=True)

    print(f"\n  aux criterion share : {(t_full - t_noaux) * 1e3:6.2f} ms")
    print(f"  neg fwd+bwd share   : {(t_full - t_noneg) * 1e3:6.2f} ms")
    print(f"  criterion total     : {(t_full - t_dummy) * 1e3:6.2f} ms"
          f"  (incl. neg fwd diff)")
    print(f"  fwd:bwd+opt split   : {t_fwd * 1e3:6.2f} : "
          f"{(t_dummy - t_fwd) * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
