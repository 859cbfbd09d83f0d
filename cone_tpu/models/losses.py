"""CONE training criterion as a pure, shape-static jnp function.

Functional equivalent of the reference SetCriterion (cone/model.py:213-425):
Hungarian-matched span L1+gIoU, fg/bg CE with negative-window queries folded
in as all-background, intra+inter-window hinge saliency, adapter NCE, and
per-decoder-layer auxiliary losses. The matcher runs on-device
(ops/matching.py) instead of scipy-on-CPU.

Targets arrive as fixed-shape arrays with masks:
    span_labels     (B, NT, 2) normalized cxw, span_mask (B, NT)
    saliency_pos    (B, P) int clip idx, saliency_neg (B, P)

Known deliberate deviation: the reference takes the negative-window max
saliency over *all* padded positions (cone/model.py:358 on a
pad_sequences_1d batch) — including garbage computed at padding; we mask
padding out. Identical when windows are full-length.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cone_tpu.config import LossConfig
from cone_tpu.ops.matching import hungarian_match, matcher_cost
from cone_tpu.ops.spans import generalized_temporal_iou, span_cxw_to_xx

FOREGROUND = 0
BACKGROUND = 1


def _weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray, class_weight) -> jnp.ndarray:
    """torch F.cross_entropy(weight=w, reduction='none') semantics, then mean.

    Per-element loss = w[label] * (-log_softmax(logits)[label]); the mean
    divides by the element count, not by the weight sum (reduction='none'
    followed by .mean(), cone/model.py:323-324).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weight[labels]
    return (w * nll).mean()


def _match_layer(outputs, tgt_spans, span_mask, cfg: LossConfig):
    cost = matcher_cost(
        outputs["pred_spans"], outputs["pred_logits"], tgt_spans,
        cost_span=cfg.set_cost_span, cost_giou=cfg.set_cost_giou,
        cost_class=cfg.set_cost_class, tgt_mask=span_mask,
    )
    return hungarian_match(cost, span_mask)  # (B, NT)


def _span_losses(outputs, tgt_spans, span_mask, assign):
    """L1 + gIoU over matched pairs (cone/model.py:266-297)."""
    src = jnp.take_along_axis(outputs["pred_spans"], assign[..., None], axis=1)  # (B, NT, 2)
    l1 = jnp.abs(src - tgt_spans).sum(-1)  # (B, NT) — per-span L1 over 2 coords
    n = jnp.clip(span_mask.sum(), min=1.0)
    loss_span = (l1 * span_mask).sum() / (2.0 * n)  # mean over 2*#spans elems

    src_xx = span_cxw_to_xx(src.reshape(-1, 2))
    # padded target slots are degenerate (0, 0) spans; if the matched
    # prediction's sigmoid width also underflows to exactly 0, gIoU there
    # is 0/0 = NaN, and NaN poisons both `NaN * 0` in the forward and the
    # `0 cotangent x NaN` in the backward. Replace masked targets with a
    # safe unit span BEFORE the IoU (the double-where rule), then mask.
    safe_tgt = jnp.where((span_mask > 0).reshape(-1, 1),
                         tgt_spans.reshape(-1, 2),
                         jnp.asarray([0.5, 1.0], tgt_spans.dtype))
    tgt_xx = span_cxw_to_xx(safe_tgt)
    giou_diag = jnp.diagonal(generalized_temporal_iou(src_xx, tgt_xx))
    giou_diag = giou_diag.reshape(span_mask.shape)
    loss_giou = ((1.0 - giou_diag) * span_mask).sum() / n
    return loss_span, loss_giou


def _label_loss(outputs, assign, span_mask, neg_outputs, eos_coef):
    """fg/bg CE; negative-window logits appended as pure background
    (cone/model.py:299-329)."""
    logits = outputs["pred_logits"]  # (B, NQ, 2)
    b = logits.shape[0]
    if neg_outputs is not None:
        logits = jnp.concatenate([logits, neg_outputs["pred_logits"]], axis=1)
    nq_tot = logits.shape[1]

    # scatter foreground labels at matched query slots
    fg = jnp.zeros((b, nq_tot), bool)
    rows = jnp.arange(b)[:, None] * jnp.ones_like(assign)
    updates = span_mask.astype(bool)
    fg = fg.at[rows, assign].max(updates)
    labels = jnp.where(fg, FOREGROUND, BACKGROUND)

    weight = jnp.array([1.0, eos_coef], jnp.float32)
    loss = _weighted_ce(logits, labels, weight)

    # class_error on matched positive-window queries (cone/misc.py:4,
    # cone/model.py:328): % of matched queries whose argmax != foreground.
    matched_logits = jnp.take_along_axis(
        outputs["pred_logits"], assign[..., None], axis=1
    )  # (B, NT, 2)
    pred = jnp.argmax(matched_logits, axis=-1)
    correct = (pred == FOREGROUND).astype(jnp.float32) * span_mask
    n = jnp.clip(span_mask.sum(), min=1.0)
    class_error = 100.0 - 100.0 * correct.sum() / n
    return loss, class_error


def _saliency_loss(outputs, sal_pos, sal_neg, neg_outputs, neg_vid_mask,
                   margin: float):
    """Intra-window hinge + inter-window hinge (cone/model.py:331-365)."""
    scores = outputs["saliency_scores"]  # (B, L)
    b, n_pairs = sal_pos.shape
    pos = jnp.take_along_axis(scores, sal_pos, axis=1)  # (B, P)
    neg = jnp.take_along_axis(scores, sal_neg, axis=1)
    loss = jnp.clip(margin + neg - pos, min=0).sum() / (b * n_pairs) * 2

    if neg_outputs is not None:
        neg_scores = neg_outputs["saliency_scores"]  # (B, L)
        if neg_vid_mask is not None:
            neg_scores = jnp.where(neg_vid_mask.astype(bool), neg_scores, -1e30)
        neg_max = neg_scores.max(axis=1, keepdims=True)  # (B, 1)
        loss_neg = (
            jnp.clip(margin + neg_max - pos, min=0).sum() / (b * n_pairs) * 2
        )
        loss = loss + loss_neg
    return loss


def adapter_nce_loss(logits_per_video: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Symmetric InfoNCE over the (B, B) video<->text similarity matrix
    (cone/model.py:250-264)."""
    logits = logits_per_video / temperature
    b = logits.shape[0]
    diag = jnp.arange(b)
    logp_v = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jax.nn.log_softmax(logits.T, axis=-1)
    loss_v = -logp_v[diag, diag].mean()
    loss_t = -logp_t[diag, diag].mean()
    return (loss_v + loss_t) / 2


def compute_losses(
    outputs: dict,
    targets: Optional[dict],
    neg_outputs: Optional[dict],
    cfg: LossConfig,
) -> dict:
    """All criterion terms (unweighted), keyed like the reference.

    Args:
        outputs: model output dict (incl. "aux_outputs" list, optionally
            "logits_per_video" for the adapter loss).
        targets: dict with span_labels (B, NT, 2), span_mask (B, NT),
            saliency_pos/neg (B, P) — or None (label-only mode,
            cone/model.py:398-401).
        neg_outputs: negative-window model outputs or None. May carry
            "vid_mask" (B, L) for the saliency max.
    """
    losses = {}
    if targets is None:
        weight = jnp.array([1.0, cfg.eos_coef], jnp.float32)
        logits = outputs["pred_logits"]
        labels = jnp.full(logits.shape[:2], BACKGROUND, jnp.int32)
        losses["loss_label"] = _weighted_ce(logits, labels, weight)
        return losses

    tgt_spans = targets["span_labels"]
    span_mask = targets["span_mask"].astype(jnp.float32)

    assign = _match_layer(outputs, tgt_spans, span_mask, cfg)
    loss_span, loss_giou = _span_losses(outputs, tgt_spans, span_mask, assign)
    losses["loss_span"] = loss_span
    losses["loss_giou"] = loss_giou
    loss_label, class_error = _label_loss(
        outputs, assign, span_mask, neg_outputs, cfg.eos_coef
    )
    losses["loss_label"] = loss_label
    losses["class_error"] = class_error
    losses["loss_saliency"] = _saliency_loss(
        outputs, targets["saliency_pos"], targets["saliency_neg"],
        neg_outputs, neg_outputs.get("vid_mask") if neg_outputs else None,
        cfg.saliency_margin,
    )

    if "logits_per_video" in outputs:
        losses["loss_adapter"] = adapter_nce_loss(
            outputs["logits_per_video"], cfg.temperature
        )

    if cfg.aux_loss:
        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            a_assign = _match_layer(aux, tgt_spans, span_mask, cfg)
            a_span, a_giou = _span_losses(aux, tgt_spans, span_mask, a_assign)
            a_label, a_err = _label_loss(
                aux, a_assign, span_mask, neg_outputs, cfg.eos_coef
            )
            losses[f"loss_span_{i}"] = a_span
            losses[f"loss_giou_{i}"] = a_giou
            losses[f"loss_label_{i}"] = a_label
            losses[f"class_error_{i}"] = a_err
    return losses


def loss_weight_dict(cfg: LossConfig, dec_layers: int) -> dict:
    """Weights for the final weighted sum (cone/model.py:499-511)."""
    w = {
        "loss_span": cfg.span_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
        "loss_label": cfg.label_loss_coef,
        "loss_saliency": cfg.lw_saliency,
    }
    if cfg.adapter_loss:
        w["loss_adapter"] = cfg.adapter_loss_coef
    if cfg.aux_loss:
        for i in range(dec_layers - 1):
            for k in ["loss_span", "loss_giou", "loss_label"]:
                w[f"{k}_{i}"] = w[k]
    return w


def total_loss(losses: dict, weights: dict) -> jnp.ndarray:
    """Weighted sum over the terms present in both dicts (cone/train.py:68-71)."""
    total = 0.0
    for k, v in losses.items():
        if k in weights:
            total = total + v * weights[k]
    return total
