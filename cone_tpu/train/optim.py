"""Optimizer: AdamW with a reduced-lr adapter group + epoch-step lr decay.

Reproduces the reference setup (cone/inference.py:511-523): AdamW
lr=1e-4 wd=1e-4 on everything, adapter params at lr * coef_lr (0.1), and a
StepLR that multiplies the lr by 0.1 every `lr_drop` epochs. Gradients are
globally clipped to `grad_clip` before the update (cone/train.py:87-88).
"""

from __future__ import annotations

import jax
import optax

from cone_tpu.config import TrainConfig


def _param_labels(params):
    def label(path, _):
        return "adapter" if "adapter_layer" in jax.tree_util.keystr(path) else "base"

    return jax.tree_util.tree_map_with_path(label, params)


def step_lr(base_lr: float, lr_drop_epochs: int, steps_per_epoch: int):
    """lr * 0.1 ** (epoch // lr_drop) as a per-step schedule."""

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (0.1 ** (epoch // lr_drop_epochs))

    return sched


def make_optimizer(params, cfg: TrainConfig, steps_per_epoch: int):
    def group(lr_scale: float):
        return optax.adamw(
            learning_rate=step_lr(cfg.lr * lr_scale, cfg.lr_drop, steps_per_epoch),
            weight_decay=cfg.wd,
        )

    tx = optax.multi_transform(
        {"base": group(1.0), "adapter": group(cfg.coef_lr)},
        _param_labels(params),
    )
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
