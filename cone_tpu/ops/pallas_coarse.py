"""Pallas TPU kernel for the coarse stage: fused query-video similarity +
per-stride segment max.

The coarse stage scores every (query, window) pair as
    max_{frame in window} <adapted_frame, query_cls>
(cone/inference.py:276-299). Window maxes decompose into stride-segment
maxes (ops/windows.py). The XLA path materializes the full (Q, L) frame-
score matrix in HBM before reducing; for MAD-scale videos (L ~ 36k, Q ~ 32+)
that is a pure HBM-bandwidth tax. This kernel streams video-feature tiles
HBM -> VMEM once (Pallas auto double-buffers the grid), does the (Q, D) x
(D, T) MXU matmul per tile, masks the ragged tail, and reduces each
stride-segment on the VPU — the (Q, L) matrix never exists.

Output is the per-segment max (Q, n_seg); the O(W) window combine
(max of adjacent segments) happens in jnp afterwards.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(ctx_l_ref, cls_ref, feats_ref, out_ref, *, tile_l: int, stride: int):
    i = pl.program_id(0)
    q = cls_ref.shape[0]
    segs = tile_l // stride

    scores = jax.lax.dot_general(
        cls_ref[:],                    # (Q, D)
        feats_ref[:],                  # (T, D)
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, T)

    lane = jax.lax.broadcasted_iota(jnp.int32, (q, tile_l), 1)
    scores = jnp.where(i * tile_l + lane < ctx_l_ref[0], scores, NEG_INF)

    # Segment max via per-segment masked reductions: `stride` is not lane-
    # aligned (45/62), so a (Q, T) -> (Q, segs, stride) reshape does not
    # lower on Mosaic; `segs` masked full-tile maxes on the VPU are cheap.
    lane_seg = lane // stride
    cols = [
        jnp.max(jnp.where(lane_seg == s, scores, NEG_INF), axis=-1, keepdims=True)
        for s in range(segs)
    ]
    # out block is (1, Q, segs) — the grid dim leads so the last two dims
    # satisfy TPU block tiling (lane-dim stores must be 128-aligned
    # otherwise); the wrapper transposes back to (Q, n_seg)
    out_ref[0] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("stride",))
def coarse_segment_max(feats: jnp.ndarray, cls: jnp.ndarray, ctx_l, stride: int):
    """Per-stride-segment max similarity.

    Args:
        feats: (L_pad, D) adapted, L2-normalized video features (internally
            zero-padded up to the tile size).
        cls: (Q, D) query CLS features; Q ideally a multiple of 8.
        ctx_l: scalar int32 — valid frame count.
        stride: static int (max_v_l // 2).

    Returns:
        (Q, L_pad // stride) segment maxes; segments past ctx_l are -inf.
    """
    l_pad, d = feats.shape
    q = cls.shape[0]

    # tile: a multiple of the stride AND of the 8-sublane tiling, near 512
    # frames (keeps the VMEM tile ~512*D*4B and the matmul MXU-sized)
    base = stride * (8 // math.gcd(stride, 8))
    tile_l = base * max(1, 512 // base)
    if l_pad % tile_l:
        extra = tile_l - l_pad % tile_l
        feats = jnp.concatenate([feats, jnp.zeros((extra, d), feats.dtype)])
        l_pad += extra
    n_seg = l_pad // stride
    segs_per_tile = tile_l // stride
    grid = l_pad // tile_l

    kernel = functools.partial(_kernel, tile_l=tile_l, stride=stride)
    tiled = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ctx_l (1,)
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q, segs_per_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid, q, segs_per_tile), jnp.float32),
    )(jnp.asarray(ctx_l, jnp.int32).reshape(1), cls, feats)
    return tiled.transpose(1, 0, 2).reshape(q, n_seg)


def window_scores_from_segment_max(seg_max: jnp.ndarray, ctx_l, stride: int,
                                   max_windows: int):
    """Combine adjacent segment maxes into window scores (window i covers
    segments {i-1, i} clipped; see ops/windows.py docstring)."""
    n_seg = seg_max.shape[-1]
    h = -(-ctx_l // stride)
    w_idx = jnp.arange(max_windows)
    j1 = jnp.minimum(jnp.clip(w_idx - 1, 0, h - 1), n_seg - 1)
    j2 = jnp.minimum(jnp.clip(w_idx, 0, h - 1), n_seg - 1)
    scores = jnp.maximum(seg_max[..., j1], seg_max[..., j2])
    valid = w_idx < (h + 1)
    return jnp.where(valid, scores, NEG_INF), valid
