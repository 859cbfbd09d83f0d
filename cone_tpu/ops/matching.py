"""Exact Hungarian matching on-device via permutation enumeration.

The reference solves a (num_queries x num_targets) linear-sum-assignment per
batch element with scipy on the CPU (cone/matcher.py:96-105), forcing a
device->host sync every training step. Here num_queries <= 6 (default 5,
cone/config.py:118), so the assignment polytope is tiny: enumerating all
num_queries! query permutations (<= 720) and scoring them with one masked
matmul is exact, shape-static, and stays on the TPU.

Cost definition matches cone/matcher.py:61-95:
    C = cost_span * L1(pred_cxw, tgt_cxw)
      + cost_giou * (-gIoU(pred_xx, tgt_xx))
      + cost_class * (-softmax(pred_logits)[foreground])
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp

from cone_tpu.ops.spans import generalized_temporal_iou, span_cxw_to_xx

BIG = 1e9


@lru_cache(maxsize=8)
def _permutations(n: int) -> tuple:
    return tuple(itertools.permutations(range(n)))


def hungarian_match(cost: jnp.ndarray, tgt_mask: jnp.ndarray) -> jnp.ndarray:
    """Solve LSAP exactly for every batch element.

    Args:
        cost: (B, NQ, NT) cost matrices; entries for invalid targets are
            ignored. NT <= NQ required (pad targets, mark with tgt_mask).
        tgt_mask: (B, NT) float/bool — 1 for real targets.

    Returns:
        assign: (B, NT) int32 — assign[b, j] = query index matched to target
            j (meaningless where tgt_mask == 0). Among equal-cost optima the
            lexicographically-smallest permutation wins (scipy agrees on all
            non-degenerate inputs; ties are measure-zero for float costs).
    """
    b, nq, nt = cost.shape
    assert nt <= nq, f"pad/clamp targets to <= num_queries ({nt} > {nq})"
    perms = jnp.asarray(_permutations(nq), dtype=jnp.int32)  # (P, NQ)
    perm_t = perms[:, :nt]  # (P, NT) — query assigned to target j under perm p

    tgt_mask = tgt_mask.astype(cost.dtype)
    # total[b, p] = sum_j cost[b, perm_t[p, j], j] * tgt_mask[b, j]
    j_idx = jnp.arange(nt)
    picked = cost[:, perm_t, j_idx]  # (B, P, NT)
    total = (picked * tgt_mask[:, None, :]).sum(-1)  # (B, P)
    best = jnp.argmin(total, axis=1)  # (B,) — argmin takes first (lex-least)
    return perm_t[best]  # (B, NT)


def matcher_cost(
    pred_spans: jnp.ndarray,
    pred_logits: jnp.ndarray,
    tgt_spans: jnp.ndarray,
    cost_span: float = 10.0,
    cost_giou: float = 1.0,
    cost_class: float = 4.0,
    foreground_label: int = 0,
    tgt_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Per-sample matching cost (B, NQ, NT); cf. cone/matcher.py:61-95.

    Unlike the reference, the cost is built per batch element (the reference
    flattens the batch and computes an all-pairs cost against every target in
    the batch, then slices the block-diagonal back out at :98-105 — same
    result, more FLOPs than needed here since our NT is fixed and tiny).

    Args:
        pred_spans: (B, NQ, 2) normalized cxw spans.
        pred_logits: (B, NQ, 2) class logits.
        tgt_spans: (B, NT, 2) normalized cxw target spans (padded).
    """
    prob_fg = jax.nn.softmax(pred_logits, axis=-1)[..., foreground_label]  # (B, NQ)
    c_class = -prob_fg[:, :, None]  # (B, NQ, NT)

    if tgt_mask is not None:
        # padded target slots are degenerate (0, 0) spans; against a
        # prediction whose sigmoid width underflowed to exactly 0, gIoU is
        # 0/0 = NaN, and in hungarian_match every permutation total
        # becomes NaN through `cost * mask` (0 * NaN = NaN) — the same
        # channel models/losses.py guards. Substitute a safe unit span.
        tgt_spans = jnp.where(tgt_mask[..., None] > 0, tgt_spans,
                              jnp.asarray([0.5, 1.0], tgt_spans.dtype))

    l1 = jnp.abs(pred_spans[:, :, None, :] - tgt_spans[:, None, :, :]).sum(-1)

    giou = jax.vmap(generalized_temporal_iou)(
        span_cxw_to_xx(pred_spans), span_cxw_to_xx(tgt_spans)
    )  # (B, NQ, NT)

    return cost_span * l1 + cost_giou * (-giou) + cost_class * c_class
