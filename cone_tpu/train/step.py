"""The jitted, DP-sharded training step.

One step = positive-window forward + negative-window forward + (optionally)
GT-proposal matching forward, criterion, grads, clipped AdamW update — the
whole of cone/train.py:53-89 as a single compiled program. The adapter gate
(`epoch >= start_epoch_for_adapter`, cone/train.py:73-78) is a static arg, so
exactly two variants compile.
"""

from __future__ import annotations




import jax
import jax.numpy as jnp

from cone_tpu.config import ConeConfig
from cone_tpu.models.cone import ConeModel
from cone_tpu.models.losses import (
    compute_losses,
    loss_weight_dict,
    total_loss,
)
from cone_tpu.parallel.mesh import batch_sharding, replicated, tp_size


def make_loss_fn(model: ConeModel, cfg: ConeConfig):
    """The criterion as one function: (params, batch, rng, adapter_on,
    deterministic) -> (total, per-term losses). Shared by the training step
    (dropout on) and the eval-split loss pass (dropout off, the reference's
    criterion.eval() stance, cone/inference.py:32-34)."""
    weights = loss_weight_dict(cfg.loss, cfg.model.dec_layers)

    def loss_fn(params, batch, rng, adapter_on: bool,
                deterministic: bool = False):
        d1, d2 = jax.random.split(rng)
        variables = {"params": params}
        pos_out = model.apply(
            variables,
            batch["query_tokens"], batch["query_mask"],
            batch["pos_motion"], batch["pos_mask"],
            deterministic=deterministic, rngs={"dropout": d1},
        )
        neg_out = None
        if cfg.loss.neg_loss:
            neg_out = dict(
                model.apply(
                    variables,
                    batch["query_tokens"], batch["query_mask"],
                    batch["neg_motion"], batch["neg_mask"],
                    deterministic=deterministic, rngs={"dropout": d2},
                )
            )
            neg_out["vid_mask"] = batch["neg_mask"]

        if adapter_on and cfg.loss.adapter_loss:
            pos_out = dict(pos_out)
            pos_out["logits_per_video"] = model.apply(
                variables,
                batch["query_cls"], batch["pos_appear"],
                batch["prop_start"], batch["prop_end"],
                method=ConeModel.clip_matching_gt,
            )

        targets = {
            "span_labels": batch["span_labels"],
            "span_mask": batch["span_mask"],
            "saliency_pos": batch["sal_pos"],
            "saliency_neg": batch["sal_neg"],
        }
        losses = compute_losses(pos_out, targets, neg_out, cfg.loss)
        total = total_loss(losses, weights)
        losses["loss_overall"] = total
        return total, losses

    return loss_fn


def make_train_step(model: ConeModel, tx, cfg: ConeConfig, mesh=None):
    """Returns train_step(params, opt_state, batch, rng, adapter_on) ->
    (params, opt_state, metrics)."""
    loss_fn = make_loss_fn(model, cfg)

    def _step(params, opt_state, batch, rng, adapter_on: bool = False):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, adapter_on
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        metrics["grad_norm"] = jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(g * g), grads)
        ) ** 0.5
        return params, opt_state, metrics

    # NB: pjit rejects kwargs when in_shardings is set — adapter_on must be
    # passed positionally.
    jit_kwargs = dict(static_argnums=(4,), donate_argnums=(0, 1))
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        if tp_size(mesh) > 1:
            # dp x tp: params/opt_state arrive pre-sharded Megatron-style
            # (parallel/mesh.shard_params); None = respect each argument's
            # committed sharding and let GSPMD propagate the outputs (the
            # donated buffers keep their layouts, so steps stay reshard-free).
            # XLA inserts both the per-layer tp all-reduces and the dp
            # gradient all-reduce.
            jit_kwargs.update(
                in_shardings=(None, None, bsh, rep),
                out_shardings=(None, None, rep),
            )
        else:
            # DP: batch sharded on its leading axis, params/optimizer
            # replicated; XLA inserts the gradient all-reduce over ICI.
            jit_kwargs.update(
                in_shardings=(rep, rep, bsh, rep),
                out_shardings=(rep, rep, rep),
            )
    return jax.jit(_step, **jit_kwargs)


def make_eval_loss_step(model: ConeModel, cfg: ConeConfig, mesh=None):
    """Returns eval_loss_step(params, batch, adapter_on) -> per-term losses.

    The criterion run forward-only on eval-split windows with dropout off —
    the eval-loss curves the reference intends to TensorBoard during
    eval_epoch (cone/inference.py:30-36, 96-98; in the released code the
    meters are prepared but never filled, so this makes the feature real)."""
    loss_fn = make_loss_fn(model, cfg)

    def _eval(params, batch, adapter_on: bool = False):
        _, losses = loss_fn(params, batch, jax.random.PRNGKey(0), adapter_on,
                            deterministic=True)
        return losses

    jit_kwargs = dict(static_argnums=(2,))
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        jit_kwargs.update(in_shardings=(rep, bsh), out_shardings=rep)
    return jax.jit(_eval, **jit_kwargs)
