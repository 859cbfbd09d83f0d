"""Temporal non-maximum suppression.

Two implementations with identical greedy semantics
(cf. utils/temporal_nms.py:25-74 in the reference):

  * `temporal_nms_host`  — numpy, exact reference behavior including its
    "hull union" IoU (union = max(ed) - min(st), utils/temporal_nms.py:17-18)
    and stable descending sort. Used in the submission post-processing path
    where bit-parity with published recall matters.

  * `temporal_nms_device` — jnp, batched over an arbitrary leading query
    axis, fixed-shape masked suppression via lax.fori_loop. Used in the
    on-device inference pipeline; one kernel for thousands of queries
    instead of the reference's pure-Python O(N^2) list scan per query.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _iou_np(head: np.ndarray, rest: np.ndarray, hull: bool) -> np.ndarray:
    """IoU of `head` (2,) vs `rest` (N, 2). hull=True uses the reference's
    'hull union' max(ed)-min(st) (utils/temporal_nms.py:17-18); hull=False
    the standard union (the 2D-TAN evaluator, cone_2dtan/lib/core/eval.py:50)."""
    inter = np.maximum(
        0.0, np.minimum(head[1], rest[:, 1]) - np.maximum(head[0], rest[:, 0])
    )
    if hull:
        union = np.maximum(head[1], rest[:, 1]) - np.minimum(head[0], rest[:, 0])
    else:
        union = (head[1] - head[0]) + (rest[:, 1] - rest[:, 0]) - inter
    out = np.zeros_like(inter)
    nz = union != 0
    out[nz] = inter[nz] / union[nz]
    return out


def temporal_nms_host(predictions, nms_thd: float, max_after_nms: int = 100,
                      hull_union: bool = True):
    """Greedy NMS over [st, ed, score] triplets; reference-exact.

    Args:
        predictions: list of [st, ed, score] (larger score = better).
        hull_union: IoU convention (True = CONE's temporal_nms, False =
            2D-TAN's standard-union nms).
    Returns:
        list of kept [st, ed, score], in descending score order, at most
        `max_after_nms` entries.
    """
    if len(predictions) == 1:
        return list(predictions)

    preds = sorted(predictions, key=lambda x: x[2], reverse=True)
    arr = np.asarray([p[:2] for p in preds], dtype=np.float64)
    alive = np.ones(len(preds), dtype=bool)
    kept = []
    idxs = np.arange(len(preds))
    while alive.sum() > 1 and len(kept) < max_after_nms:
        cur = idxs[alive][0]
        rest = idxs[alive][1:]
        iou = _iou_np(arr[cur], arr[rest], hull_union)
        alive[rest[iou > nms_thd]] = False
        alive[cur] = False
        kept.append(cur)
    if len(kept) < max_after_nms and alive.sum() >= 1:
        kept.append(idxs[alive][0])
    return [preds[i] for i in kept]


def dedup_spans_device(spans, scores_list, valid):
    """Device equivalent of the reference's dict-based candidate dedup
    (cone/inference.py:214-216): candidates sharing an identical (st, ed)
    key collapse to ONE entry sitting at the FIRST occurrence's position
    (a dict key keeps its insertion slot) but carrying the LAST
    occurrence's scores (later assignments overwrite the value).

    Args:
        spans: (..., P, 2) candidate spans (already rounded like the host's
            4-dp candidates so float equality IS the dict-key equality).
        scores_list: sequence of (..., P) score arrays rewritten in lockstep.
        valid: (..., P) bool.

    Returns (new_scores_tuple, new_valid): non-first duplicates invalidated,
    surviving entries' scores replaced by their key's last occurrence.
    """
    st, ed = spans[..., 0], spans[..., 1]
    same = (
        (st[..., :, None] == st[..., None, :])
        & (ed[..., :, None] == ed[..., None, :])
        & valid[..., :, None]
        & valid[..., None, :]
    )
    p = spans.shape[-2]
    idx = jnp.arange(p)
    first = jnp.min(jnp.where(same, idx, p), axis=-1)
    last = jnp.maximum(jnp.max(jnp.where(same, idx, -1), axis=-1), 0)
    keep = valid & (first == idx)
    new_scores = tuple(
        jnp.take_along_axis(s, last, axis=-1) for s in scores_list
    )
    return new_scores, keep


def temporal_nms_device(
    spans: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    nms_thd: float,
    max_after_nms: int,
    hull_union: bool = True,
    max_before_nms: int | None = None,
):
    """Batched greedy NMS on device.

    Args:
        spans: (..., P, 2) candidate spans in seconds.
        scores: (..., P) ranking scores (higher better).
        valid: (..., P) bool — candidate exists.
        nms_thd: static float; negative disables suppression (keep order).
        max_after_nms: static int K.
        max_before_nms: static int; when set and suppression is on, only the
            top-`max_before_nms` candidates by score enter NMS at all — the
            rest neither survive nor suppress (the host path's
            `moments[: cfg.max_before_nms]` truncation,
            cone/inference.py:103-127; like the reference it does NOT apply
            when nms_thd < 0).

    Returns:
        (kept_spans (..., K, 2), kept_scores (..., K), kept_valid (..., K))
        sorted by descending score, suppressed/missing slots invalid.
    """
    p = scores.shape[-1]
    neg = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-neg, axis=-1, stable=True)  # (..., P)
    s_spans = jnp.take_along_axis(spans, order[..., None], axis=-2)
    s_scores = jnp.take_along_axis(neg, order, axis=-1)
    s_valid = jnp.take_along_axis(valid, order, axis=-1)

    if nms_thd != -1:  # the reference's no-NMS sentinel is exactly -1
        # (cone/inference.py:113, mirrored by the host path); any other
        # negative threshold must suppress like the host does
        if max_before_nms is not None and max_before_nms < p:
            s_valid = s_valid & (jnp.arange(p) < max_before_nms)
        st, ed = s_spans[..., 0], s_spans[..., 1]

        def body(i, keep):
            head_st = st[..., i, None]
            head_ed = ed[..., i, None]
            inter = jnp.clip(jnp.minimum(head_ed, ed) - jnp.maximum(head_st, st), min=0)
            if hull_union:
                union = jnp.maximum(head_ed, ed) - jnp.minimum(head_st, st)
            else:
                union = (head_ed - head_st) + (ed - st) - inter
            iou = jnp.where(union != 0, inter / jnp.where(union == 0, 1.0, union), 0.0)
            later = jnp.arange(p) > i
            head_alive = keep[..., i, None]
            suppress = head_alive & later & (iou > nms_thd)
            return keep & ~suppress

        keep = jax.lax.fori_loop(0, p, body, s_valid)
    else:
        keep = s_valid

    # Compact the kept entries to the front, preserving score order.
    kept_rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1  # (..., P)
    slot = jnp.where(keep, kept_rank, p)  # dead entries -> out of range
    # scatter into K slots via argsort of slot index
    take = jnp.argsort(jnp.where(slot < max_after_nms, slot, p + jnp.arange(p)), axis=-1)
    take = take[..., :max_after_nms]
    out_spans = jnp.take_along_axis(s_spans, take[..., None], axis=-2)
    out_scores = jnp.take_along_axis(s_scores, take, axis=-1)
    out_valid = jnp.take_along_axis(keep & (slot < max_after_nms), take, axis=-1)
    return out_spans, out_scores, out_valid
