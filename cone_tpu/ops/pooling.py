"""Masked segment mean-pooling for proposal features, pure jnp.

Replaces the reference's per-proposal Python loops
(cone/model.py:163-166 and :194-200) with one masked matmul over the clip
axis — (B, NQ, L) x (B, L, D) — which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_segment_mean(
    features: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
) -> jnp.ndarray:
    """Mean of features[b, start[b, k]:end[b, k], :] for every (b, k).

    Args:
        features: (B, L, D).
        start: (B, K) int clip indices (inclusive).
        end: (B, K) int clip indices (exclusive).

    Returns:
        (B, K, D) means. Empty segments (end <= start) yield zeros (the
        reference produces NaN there, cone/model.py:197-199 — an empty
        proposal is degenerate and its matching score is discarded anyway;
        zeros keep downstream arithmetic finite).
    """
    l = features.shape[1]
    pos = jnp.arange(l)[None, None, :]  # (1, 1, L)
    seg = (pos >= start[:, :, None]) & (pos < end[:, :, None])  # (B, K, L)
    seg = seg.astype(features.dtype)
    count = jnp.clip(seg.sum(-1, keepdims=True), min=1.0)  # (B, K, 1)
    # HIGHEST: this is an fp32 average of features, not a model matmul —
    # bf16 MXU passes would bias the pooled proposal features.
    summed = jnp.einsum(
        "bkl,bld->bkd", seg, features, precision=jax.lax.Precision.HIGHEST
    )
    return summed / count


def proposal_mean_pool(
    vid_appear: jnp.ndarray,
    vid_appear_mask: jnp.ndarray,
    pred_spans_cxw: jnp.ndarray,
) -> jnp.ndarray:
    """Pool appearance features inside each predicted proposal.

    Mirrors cone/model.py:186-200: spans are denormalized by the *valid*
    window length (mask sum), start = relu(floor(st)), end = ceil(ed).

    Args:
        vid_appear: (B, L, D) appearance features.
        vid_appear_mask: (B, L) 1/0 validity.
        pred_spans_cxw: (B, NQ, 2) normalized (center, width) spans.

    Returns:
        (B, NQ, D) pooled proposal features.
    """
    from cone_tpu.ops.spans import span_cxw_to_xx

    duration = vid_appear_mask.sum(-1)  # (B,)
    prop = span_cxw_to_xx(pred_spans_cxw) * duration[:, None, None]  # (B, NQ, 2)
    start = jnp.maximum(jnp.floor(prop[..., 0]), 0.0).astype(jnp.int32)
    end = jnp.ceil(prop[..., 1]).astype(jnp.int32)
    return masked_segment_mean(vid_appear, start, end)


def matching_sim_gt(adapt_fn, src_cls_txt, src_vid_appear, proposal_start,
                    proposal_end):
    """GT-proposal <-> text CLS similarity matrix (B, B) — the matching
    branch both model families share verbatim (cone/model.py:130-148,
    cone_2dtan/lib/models/cone_tan.py:40-72). `adapt_fn` is the model's
    residual adapter (or identity)."""
    text = src_cls_txt / jnp.linalg.norm(src_cls_txt, axis=1, keepdims=True)
    pooled = masked_segment_mean(
        src_vid_appear, proposal_start[:, None], proposal_end[:, None]
    )[:, 0]  # (B, D)
    prop = adapt_fn(pooled)
    prop = prop / jnp.linalg.norm(prop, axis=1, keepdims=True)
    return jnp.einsum("bd,ad->ba", prop, text)


def matching_scores_pred(adapt_fn, src_cls_txt, pooled):
    """(B, K, D) pooled proposal features -> (B, K) cosine matching scores
    with the safe normalize both families need (empty proposals pool to
    exact zeros; a plain norm-divide would emit NaN gradients there)."""
    text = src_cls_txt / jnp.linalg.norm(src_cls_txt, axis=1, keepdims=True)
    prop = adapt_fn(pooled)
    n2 = jnp.sum(prop * prop, axis=2, keepdims=True)
    prop = jnp.where(n2 > 0, prop * jax.lax.rsqrt(jnp.where(n2 > 0, n2, 1.0)),
                     0.0)
    return jnp.einsum("bld,bd->bl", prop, text)
