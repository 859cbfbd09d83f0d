"""Optimizer: AdamW with a reduced-lr adapter group + epoch-step lr decay.

Reproduces the reference setup (cone/inference.py:511-523): AdamW
lr=1e-4 wd=1e-4 on everything, adapter params at lr * coef_lr (0.1), and a
StepLR that multiplies the lr by 0.1 every `lr_drop` epochs. Gradients are
globally clipped to `grad_clip` before the update (cone/train.py:87-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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


# ----------------------- TAN family (2D-TAN variant) -----------------------


def make_tan_optimizer(cfg: TrainConfig):
    """Adam + plateau-controlled lr for the TAN family.

    The reference uses Adam(lr, betas=(0.9, 0.999), weight_decay) with a
    ReduceLROnPlateau(factor=0.8, patience=20) scheduler
    (cone_2dtan/moment_localization/train.py:143-147,
    lib/core/config.py:75-76) and a HARDCODED global-norm clip at 10 — the
    engine's on_forward hook fires between loss.backward() and
    optimizer.step() (train.py:457-458, lib/core/engine.py:43-56). torch
    Adam applies weight decay to the (already clipped) gradient before the
    moment updates (L2, not decoupled AdamW), so the chain order here is
    clip -> add_decayed_weights -> adam. The learning rate lives in
    `opt_state.hyperparams["learning_rate"]` so the host-side
    `ReduceLROnPlateau` controller can rescale it between epochs without
    recompiling the train step.
    """
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    if cfg.wd > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.wd), tx)
    return optax.chain(optax.clip_by_global_norm(10.0), tx)


class ReduceLROnPlateau:
    """Host-side plateau controller on the eval stop-score (maximized).

    torch semantics (factor/patience/threshold, mode='max' since the stop
    score is a recall): after `patience` consecutive evals without the score
    improving by more than `threshold` (relative), multiply the lr by
    `factor`. Defaults follow cone_2dtan/lib/core/config.py:75-76.
    """

    def __init__(self, factor: float = 0.8, patience: int = 20,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = -float("inf")
        self.num_bad = 0

    def step(self, score: float, opt_state):
        """Record an eval score; rescale the injected lr in-place on plateau.

        Returns (opt_state, lr) — opt_state is the same object (the
        hyperparams dict entry is replaced), returned for call-site clarity.
        """
        # torch rel-mode max: improved iff score > best * (1 + threshold)
        if self.best == -float("inf") or score > self.best * (1.0 + self.threshold):
            self.best = score
            self.num_bad = 0
        else:
            self.num_bad += 1
        hp = _find_hyperparams(opt_state)
        lr = float(jax.device_get(hp["learning_rate"]))
        if self.num_bad > self.patience:
            import numpy as np

            lr = max(lr * self.factor, self.min_lr)
            # host numpy (not a committed device array): multi-process pjit
            # accepts numpy inputs as process-identical and replicates them,
            # while a device-0-committed scalar would clash with the global
            # mesh sharding
            hp["learning_rate"] = np.asarray(
                lr, dtype=np.asarray(jax.device_get(hp["learning_rate"])).dtype
            )
            self.num_bad = 0
        return opt_state, lr


def _find_hyperparams(opt_state):
    """Locate the InjectHyperparamsState dict inside a (possibly chained)
    optax state tuple."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if isinstance(opt_state, tuple):
        for s in opt_state:
            try:
                return _find_hyperparams(s)
            except ValueError:
                continue
    raise ValueError("no inject_hyperparams state found in opt_state")
