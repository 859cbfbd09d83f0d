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


def _kernel(ctx_l_ref, cls_t_ref, feats_ref, out_ref, *, tile_l: int, stride: int):
    i = pl.program_id(0)
    q = cls_t_ref.shape[1]
    segs = tile_l // stride

    # Canonical MXU orientation: lhs (T, D) contracts its LANE dim, rhs
    # (D, Q) contracts its SUBLANE dim — Mosaic feeds the MXU directly.
    # (The r1 version computed (Q, D)x(T, D)^T, which forced a VPU
    # transpose of every feature tile and made the kernel 5.6x slower
    # than XLA; this orientation beats XLA, tools/bench_coarse.py.)
    scores = jax.lax.dot_general(
        feats_ref[:],                  # (T, D)
        cls_t_ref[:],                  # (D, Q)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, Q)

    row = jax.lax.broadcasted_iota(jnp.int32, (tile_l, q), 0)
    scores = jnp.where(i * tile_l + row < ctx_l_ref[0], scores, NEG_INF)

    # Segment max via static sublane slices: `stride` is not tile-aligned
    # (45/62), so a (T, Q) -> (segs, stride, Q) reshape does not lower on
    # Mosaic, but static row slices do — each row is read once (vs `segs`
    # full-tile passes with masked reductions).
    rows = [
        jnp.max(scores[s * stride : (s + 1) * stride], axis=0, keepdims=True)
        for s in range(segs)
    ]
    # out block is (1, segs, Q) — the grid dim leads so the last two dims
    # are full-dim (stores with partial lane offsets don't lower); the
    # wrapper reshapes/transposes back to (Q, n_seg)
    out_ref[0] = jnp.concatenate(rows, axis=0)


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

    # tile: a multiple of the stride AND of the 8-sublane tiling, near 2048
    # frames — big enough that the per-grid-step fixed cost amortizes
    # (73 steps of 496 rows measured 2.5x slower than 19 steps of 1984),
    # small enough that two ~4 MB buffers double-buffer in 16 MB VMEM
    base = stride * (8 // math.gcd(stride, 8))
    tile_l = base * max(1, 2048 // base)
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
            pl.BlockSpec((d, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, segs_per_tile, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid, segs_per_tile, q), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # tiles are independent: lets Mosaic pipeline the HBM stream
            dimension_semantics=("parallel",),
        ),
    )(jnp.asarray(ctx_l, jnp.int32).reshape(1), cls.T, feats)
    # (grid, segs, Q) -> (Q, n_seg): the transpose is over the tiny score
    # matrix, not the feature stream
    return tiled.reshape(n_seg, q).T


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
