"""Sliding-window geometry and coarse window scoring, pure jnp + numpy.

The reference (cone/ego4d_mad_dataloader.py:58,142-159 and
cone/inference.py:286-299) defines windows over a video of `ctx_l` clips as:

    stride     = max_v_l // 2
    num_window = ceil(ctx_l / stride) + 1
    window i   = [max((i-1)*stride, 0), min((i-1)*stride + max_v_l, ctx_l))

i.e. windows of length max_v_l overlapping by half, with one extra
half-window hanging off each edge. The coarse stage scores window i as the
max frame-similarity inside it.

TPU-first reformulation: because consecutive windows share a half, the
per-window max over frames reduces to a *segment max over strides* followed
by a pairwise max — O(L) instead of the reference's O(W * max_v_l) Python
loop. With L static (padded) everything jit-compiles to one fused kernel.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

NEG_INF = -1e30


def num_windows(ctx_l: int, stride: int) -> int:
    """ceil(ctx_l / stride) + 1 (host-side int math).

    Reference: cone/ego4d_mad_dataloader.py:142.
    """
    return math.ceil(ctx_l / stride) + 1


def window_bounds(window_idx, stride: int, max_v_l: int, ctx_l):
    """Start/end clip indices of window(s) `window_idx` (int or array).

    Reference: cone/ego4d_mad_dataloader.py:148-149.
    """
    start = jnp.maximum((window_idx - 1) * stride, 0)
    end = jnp.minimum((window_idx - 1) * stride + max_v_l, ctx_l)
    return start, end


def window_scores_from_frame_scores(
    frame_scores: jnp.ndarray,
    ctx_l: jnp.ndarray,
    stride: int,
    max_windows: int,
):
    """Per-window max of frame scores, vectorized over all windows at once.

    Args:
        frame_scores: (L_pad,) float scores; entries at positions >= ctx_l are
            ignored (internally forced to -inf).
        ctx_l: scalar int — true number of clips (may be traced).
        stride: static int, max_v_l // 2.
        max_windows: static int — number of window slots to emit. Must be
            >= num_windows(ctx_l, stride) for all videos in the batch.

    Returns:
        (scores, valid): scores (max_windows,) with invalid slots = -inf,
        valid (max_windows,) bool, True for i < ceil(ctx_l/stride)+1.

    Window i spans clip range [max((i-1)s, 0), min((i-1)s + 2s, ctx_l)),
    which is exactly stride-segments {i-1, i} clipped to [0, H) where
    H = ceil(ctx_l / s). Hence:
        window_score[i] = max(seg_max[clip(i-1, 0, H-1)], seg_max[clip(i, 0, H-1)])
    matching the reference loop at cone/inference.py:290-295.
    """
    l_pad = frame_scores.shape[0]
    n_seg = -(-l_pad // stride)  # ceil
    pad = n_seg * stride - l_pad

    idx = jnp.arange(l_pad)
    masked = jnp.where(idx < ctx_l, frame_scores, NEG_INF)
    if pad:
        masked = jnp.concatenate([masked, jnp.full((pad,), NEG_INF, masked.dtype)])
    seg_max = masked.reshape(n_seg, stride).max(axis=1)  # (n_seg,)

    h = -(-ctx_l // stride)  # ceil, traced ok
    w_idx = jnp.arange(max_windows)
    j1 = jnp.clip(w_idx - 1, 0, h - 1)
    j2 = jnp.clip(w_idx, 0, h - 1)
    j1 = jnp.minimum(j1, n_seg - 1)
    j2 = jnp.minimum(j2, n_seg - 1)
    scores = jnp.maximum(seg_max[j1], seg_max[j2])
    valid = w_idx < (h + 1)
    scores = jnp.where(valid, scores, NEG_INF)
    return scores, valid


def slice_windows(
    features: jnp.ndarray,
    window_idx: jnp.ndarray,
    stride: int,
    max_v_l: int,
    ctx_l,
):
    """Gather K windows out of a video feature array as one fixed-shape batch.

    This is the device-side replacement for the reference's per-window
    Python slicing (cone/ego4d_mad_dataloader.py:147-159); the padded-batch
    representation mirrors what the reference's own demo does at
    run_on_video/cone_localizator.py:144-174.

    Args:
        features: (L_pad, D) — zero-padded video features.
        window_idx: (K,) int window indices (may include invalid/padded
            slots; caller tracks a window-valid mask separately).
        stride, max_v_l: static ints.
        ctx_l: scalar int — true number of clips.

    Returns:
        feats   (K, max_v_l, D) — windows, zero-padded past their length,
        mask    (K, max_v_l) float32 1/0 validity,
        starts  (K,) int32 window start clip index,
        lengths (K,) int32 window length in clips.
    """
    l_pad = features.shape[0]
    start = jnp.maximum((window_idx - 1) * stride, 0)
    end = jnp.minimum((window_idx - 1) * stride + max_v_l, ctx_l)
    pos = start[:, None] + jnp.arange(max_v_l)[None, :]  # (K, max_v_l)
    mask = (pos < end[:, None]).astype(jnp.float32)
    gathered = features[jnp.clip(pos, 0, l_pad - 1)]  # (K, max_v_l, D)
    feats = gathered * mask[..., None]
    return feats, mask, start.astype(jnp.int32), (end - start).astype(jnp.int32)
