"""Training step for the CONE-TAN variant.

One compiled program per adapter gate, mirroring the reference closure
(cone_2dtan/moment_localization/train.py:254-338): positive-window scaled-IoU
BCE, negative-window map pushed toward an all-zero target
(train.py:266-272), and the adapter NCE on GT proposals.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from cone_tpu.models.tan import ConeTanModel, TanConfig, bce_rescale_loss
from cone_tpu.models.losses import adapter_nce_loss
from cone_tpu.parallel.mesh import batch_sharding, replicated


def iou_target_map_jnp(num_clips: int, start_pos, end_pos):
    """Batched jnp version of models/tan.py:iou_target_map.

    start_pos/end_pos: (B,) floats in clip units -> (B, S, E) IoU targets.
    """
    s = jnp.arange(num_clips, dtype=jnp.float32)[None, :, None]
    e = jnp.arange(1, num_clips + 1, dtype=jnp.float32)[None, None, :]
    st = start_pos[:, None, None]
    ed = end_pos[:, None, None]
    inter = jnp.clip(jnp.minimum(e, ed) - jnp.maximum(s, st), min=0)
    union = jnp.clip(jnp.maximum(e, ed) - jnp.minimum(s, st), min=0)
    return jnp.where(union > 0, inter / jnp.where(union == 0, 1.0, union), 0.0)


def make_tan_loss_fn(model: ConeTanModel, tan_cfg: TanConfig,
                     use_neg_loss: bool = True,
                     adapter_loss_coef: float = 0.1):
    # adapter_loss_coef default = the reference's TRAIN.ADAPTER_LOSS_WEIGHT
    # (lib/core/config.py:83); the loop passes cfg.loss.adapter_loss_coef
    def loss_fn(params, batch, adapter_on: bool):
        variables = {"params": params}
        pos_scores, map_mask = model.apply(
            variables, batch["query_tokens"], batch["query_mask"],
            batch["pos_motion"],
        )
        # window-local GT span in clip units, from the normalized cxw label;
        # IoU targets live on the pooled map grid, so positions divide by
        # TARGET_STRIDE (cone_2dtan/lib/datasets/mad.py:150-153)
        c, w = batch["span_labels"][:, 0, 0], batch["span_labels"][:, 0, 1]
        wl = batch["video_length"].astype(jnp.float32)
        start_pos = (c - w / 2) * wl / tan_cfg.frame_stride
        end_pos = (c + w / 2) * wl / tan_cfg.frame_stride
        targets = iou_target_map_jnp(tan_cfg.num_clips, start_pos, end_pos)
        loss, _ = bce_rescale_loss(
            pos_scores, map_mask, targets,
            tan_cfg.min_iou, tan_cfg.max_iou, tan_cfg.bias,
        )
        metrics = {"loss_bce": loss}

        if use_neg_loss:
            neg_scores, _ = model.apply(
                variables, batch["query_tokens"], batch["query_mask"],
                batch["neg_motion"],
            )
            neg_loss, _ = bce_rescale_loss(
                neg_scores, map_mask, jnp.zeros_like(neg_scores),
                tan_cfg.min_iou, tan_cfg.max_iou, tan_cfg.bias,
            )
            metrics["loss_neg_bce"] = neg_loss
            loss = loss + neg_loss

        if adapter_on and tan_cfg.adapter_module == "linear":
            logits = model.apply(
                variables, batch["query_cls"], batch["pos_appear"],
                batch["prop_start"], batch["prop_end"],
                method=ConeTanModel.clip_matching_gt,
            )
            a_loss = adapter_nce_loss(logits, tan_cfg.temperature)
            metrics["loss_adapter"] = a_loss
            # the reference weights the TAN adapter NCE by
            # TRAIN.ADAPTER_LOSS_WEIGHT = 0.1 (lib/core/config.py:83,
            # moment_localization/train.py:284); reuse the shared
            # loss.adapter_loss_coef knob (presets set it to 0.1)
            loss = loss + adapter_loss_coef * a_loss

        metrics["loss_overall"] = loss
        return loss, metrics

    return loss_fn


def make_tan_train_step(model: ConeTanModel, tx, tan_cfg: TanConfig,
                        use_neg_loss: bool = True, mesh=None,
                        adapter_loss_coef: float = 0.1):
    loss_fn = make_tan_loss_fn(model, tan_cfg, use_neg_loss, adapter_loss_coef)

    def _step(params, opt_state, batch, rng, adapter_on: bool = False):
        del rng  # TAN has no dropout
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, adapter_on
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        metrics["grad_norm"] = jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(g * g), grads)
        ) ** 0.5
        return params, opt_state, metrics

    jit_kwargs = dict(static_argnums=(4,), donate_argnums=(0, 1))
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        jit_kwargs.update(
            in_shardings=(rep, rep, bsh, rep), out_shardings=(rep, rep, rep)
        )
    return jax.jit(_step, **jit_kwargs)


def make_tan_eval_loss_step(model: ConeTanModel, tan_cfg: TanConfig,
                            use_neg_loss: bool = True, mesh=None,
                            adapter_loss_coef: float = 0.1):
    """Forward-only criterion over eval-split windows (TAN has no dropout,
    so this is the train loss fn without the update), mirroring the 2D-TAN
    engine's loss-reporting test pass (cone_2dtan/lib/core/engine.py:75-102)."""
    loss_fn = make_tan_loss_fn(model, tan_cfg, use_neg_loss, adapter_loss_coef)

    def _eval(params, batch, adapter_on: bool = False):
        _, metrics = loss_fn(params, batch, adapter_on)
        return metrics

    jit_kwargs = dict(static_argnums=(2,))
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        jit_kwargs.update(in_shardings=(rep, bsh), out_shardings=rep)
    return jax.jit(_eval, **jit_kwargs)
