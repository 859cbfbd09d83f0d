"""Temporal span geometry — the bottom of the stack, pure jnp.

Semantics match the reference math (cone/span_utils.py) exactly so that
recall parity is checkable; the implementation is vectorized jnp that XLA
fuses into surrounding computation.

Spans come in two formats:
  xx  = (start, end)
  cxw = (center, width)
All functions broadcast over leading dims; the last dim is always 2.
"""

from __future__ import annotations

import jax.numpy as jnp


def span_xx_to_cxw(xx_spans: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) (st, ed) -> (..., 2) (center, width).

    Reference: cone/span_utils.py:4-22.
    """
    center = xx_spans.sum(-1) * 0.5
    width = xx_spans[..., 1] - xx_spans[..., 0]
    return jnp.stack([center, width], axis=-1)


def span_cxw_to_xx(cxw_spans: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) (center, width) -> (..., 2) (st, ed).

    Reference: cone/span_utils.py:25-41.
    """
    x1 = cxw_spans[..., 0] - 0.5 * cxw_spans[..., 1]
    x2 = cxw_spans[..., 0] + 0.5 * cxw_spans[..., 1]
    return jnp.stack([x1, x2], axis=-1)


def temporal_iou(spans1: jnp.ndarray, spans2: jnp.ndarray):
    """Pairwise temporal IoU between two span sets in xx format.

    Args:
        spans1: (N, 2)
        spans2: (M, 2)
    Returns:
        (iou, union): both (N, M).

    Reference: cone/span_utils.py:44-71.
    """
    areas1 = spans1[:, 1] - spans1[:, 0]  # (N,)
    areas2 = spans2[:, 1] - spans2[:, 0]  # (M,)

    left = jnp.maximum(spans1[:, None, 0], spans2[None, :, 0])  # (N, M)
    right = jnp.minimum(spans1[:, None, 1], spans2[None, :, 1])  # (N, M)

    inter = jnp.clip(right - left, min=0)  # (N, M)
    union = areas1[:, None] + areas2[None, :] - inter  # (N, M)

    iou = inter / union
    return iou, union


def temporal_intersection_over_pred(gt_spans: jnp.ndarray, pred_spans: jnp.ndarray) -> jnp.ndarray:
    """Intersection normalized by the predicted span length. (N, M).

    Reference: cone/span_utils.py:74-88.
    """
    left = jnp.maximum(gt_spans[:, None, 0], pred_spans[None, :, 0])
    right = jnp.minimum(gt_spans[:, None, 1], pred_spans[None, :, 1])
    inter = jnp.clip(right - left, min=0)
    return inter / (pred_spans[None, :, 1] - pred_spans[None, :, 0])


def generalized_temporal_iou(spans1: jnp.ndarray, spans2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 1-D generalized IoU (https://giou.stanford.edu/), (N, M).

    Unlike the reference (cone/span_utils.py:91-120) this has no runtime
    validity asserts — validity is enforced upstream (spans produced by
    sigmoid cxw->xx always satisfy ed >= st).
    """
    spans1 = spans1.astype(jnp.float32)
    spans2 = spans2.astype(jnp.float32)
    iou, union = temporal_iou(spans1, spans2)

    left = jnp.minimum(spans1[:, None, 0], spans2[None, :, 0])
    right = jnp.maximum(spans1[:, None, 1], spans2[None, :, 1])
    enclosing_area = jnp.clip(right - left, min=0)

    return iou - (enclosing_area - union) / enclosing_area


def round4_device(x: jnp.ndarray) -> jnp.ndarray:
    """Decimal 4-dp rounding on device, valid across MAD time magnitudes.

    The host parity path rounds with float(f"{v:.4f}")
    (cone/inference.py:83); a naive fp32 `round(x * 1e4) / 1e4` loses the
    .5 boundary entirely once x * 1e4 exceeds 2^23 (ULP 1 at 1e7 — i.e.
    any timestamp past ~839 s, every MAD movie). Splitting off the integer
    part keeps the scaled fraction < 1e4, where fp32 resolves ~6e-4, so
    the rounding decision matches the host's within ~6e-4 of an exact .5
    boundary instead of half a quantum."""
    i = jnp.floor(x)
    return i + jnp.round((x - i) * 1e4) / 1e4
