"""A/B: shipping two-apply train step vs fused pos+neg single apply.

tools/profile_train_ablate.py showed the negative-window forward+backward
is ~47% of the bf16 train step at bsz 128 (8.07 of 17.21 ms) while the
criterion is ~free. The pos and neg forwards run the SAME model over the
same query tokens with different video windows — on TPU they can be ONE
model.apply over a 2B-row batch (windows are just rows; cone.py's design
contract), halving the kernel count of the dominant fusion chains.

Semantics: identical math per row; dropout stays iid per element (one key
over the 2B tensor), so training is equivalent in distribution — only the
exact per-seed bit stream changes vs the two-apply step. Reference
surface: cone/train.py:58-66 (two sequential model() calls).

    python tools/bench_fused_step.py [bsz ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from profile_train_ablate import build  # noqa: E402


def make_fused_step(model, tx, cfg):
    import jax
    import jax.numpy as jnp

    from cone_tpu.models.losses import (
        compute_losses,
        loss_weight_dict,
        total_loss,
    )

    weights = loss_weight_dict(cfg.loss, cfg.model.dec_layers)

    def loss_fn(params, batch, rng):
        d1, _ = jax.random.split(rng)
        b = batch["query_tokens"].shape[0]
        txt2 = jnp.concatenate([batch["query_tokens"]] * 2, axis=0)
        txtm2 = jnp.concatenate([batch["query_mask"]] * 2, axis=0)
        vid2 = jnp.concatenate([batch["pos_motion"], batch["neg_motion"]], 0)
        vidm2 = jnp.concatenate([batch["pos_mask"], batch["neg_mask"]], 0)
        out2 = model.apply({"params": params}, txt2, txtm2, vid2, vidm2,
                           deterministic=False, rngs={"dropout": d1})
        pos_out = {
            "pred_logits": out2["pred_logits"][:b],
            "pred_spans": out2["pred_spans"][:b],
            "saliency_scores": out2["saliency_scores"][:b],
            "aux_outputs": [
                {"pred_logits": a["pred_logits"][:b],
                 "pred_spans": a["pred_spans"][:b]}
                for a in out2["aux_outputs"]
            ],
        }
        neg_out = {
            "pred_logits": out2["pred_logits"][b:],
            "saliency_scores": out2["saliency_scores"][b:],
            "vid_mask": batch["neg_mask"],
        }
        targets = {
            "span_labels": batch["span_labels"],
            "span_mask": batch["span_mask"],
            "saliency_pos": batch["sal_pos"],
            "saliency_neg": batch["sal_neg"],
        }
        losses = compute_losses(pos_out, targets, neg_out, cfg.loss)
        tot = total_loss(losses, weights)
        losses["loss_overall"] = tot
        return tot, losses

    @jax.jit
    def step(params, opt_state, batch, rng, _adapter_on=False):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    return step


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
    print(f"  {label:12s}: {dt * 1e3:7.2f} ms/step"
          f"  ({len(dev_batches[0]['query_mask']) / dt:8.0f} samples/s)",
          flush=True)
    return dt


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32, 128]
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for bsz in sizes:
        print(f"bsz={bsz}", flush=True)
        cfg, model, params, opt_state, step, batches, tx = build(
            bsz, aux=True, neg=True)
        t_ship = time_steps(step, params, opt_state, batches, "two-apply")

        cfg, model, params, opt_state, _, batches, tx = build(
            bsz, aux=True, neg=True)
        fused = make_fused_step(model, tx, cfg)
        t_fused = time_steps(fused, params, opt_state, batches, "fused")
        print(f"  fused speedup: {t_ship / t_fused:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
