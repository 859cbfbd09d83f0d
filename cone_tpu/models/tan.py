"""CONE-TAN: the 2D-TAN alternate base model inside the CONE window
machinery, in flax.linen.

Functional equivalent of cone_2dtan/lib/models (cone_tan.py:11-119):
frame conv+pool -> sparse multi-scale 2D proposal map (start x end) ->
LSTM-encoded query fused by normalized Hadamard product -> stacked
mask-renormalized 2D convs -> 1-channel score map. The matching/adapter
branch is shared with CONE (same residual-adapter mean-pool head,
cone_tan.py:40-119 mirrors cone/model.py:130-210).

TPU-first notes:
  * layout is channel-last everywhere ((B, L, C) / (B, S, E, C) NHWC);
  * the sparse map scatter uses static index arrays computed once at trace
    time (the reference's in-place fancy indexing, sparse.py:43-66), so the
    whole forward is one fused XLA program — no Python per-scale loops at
    run time;
  * mask renormalization counts come from a constant ones-kernel conv that
    XLA folds (the reference materializes it on `.cuda()` every call,
    map_modules/__init__.py:3-17).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


from cone_tpu.config import TanConfig  # canonical definition lives in config


def sparse_map_layout(num_clips: int, num_scale_layers: Sequence[int]):
    """Static bookkeeping of the multi-scale pooling cascade.

    Returns a list of per-(scale, layer) records:
        (scale_idx, layer_idx, kernel, stride, pool_ok, ori_s_idxs, ori_e_idxs)
    where ori_{s,e}_idxs are the (start, end) cells of the full
    (num_clips x num_clips) map this pooling stage fills
    (sparse.py:43-66 + recover_to_original_map :105-125).

    Degenerate geometries (small num_clips / deep scale stacks) mirror the
    reference's try/except (sparse.py:28-31) exactly: only the pool op is
    guarded there, so a stage whose pool succeeds still advances x even when
    its scatter range is empty (pool_ok=True, empty index lists), and a stage
    whose pool would fail (input shorter than the kernel) leaves x unchanged
    (pool_ok=False) but still scatters the stale x into any in-map cells.
    Stages where both the pool fails and the scatter is empty are dropped.
    (The reference's UNguarded scatter would actually crash on a
    length-mismatched stage — torch rejects broadcasting non-empty x into an
    empty indexing result — so at such geometries this layout is defined
    where the reference is not; the guarded pool op's semantics are what we
    pin.)
    """
    records = []
    length = num_clips
    acum_layers = 0
    stride = 1
    for scale_idx, num_layer in enumerate(num_scale_layers):
        layers = [(1, 1) if scale_idx == 0 else (3, 2)] + [(2, 1)] * (num_layer - 1)
        scale_len = length // layers[0][1]
        for i, (k, s) in enumerate(layers):
            pool_ok = length >= k  # torch raises on empty pool output
            if pool_ok:
                length = (length - k) // s + 1
            stride = stride * s
            n = scale_len - i
            ori_s = list(range(0, num_clips - acum_layers - i * stride, stride))
            ori_e = [s_idx + acum_layers + i * stride for s_idx in ori_s]
            # the (possibly stale) sequence may be shorter than the scatter
            # range at the edge; trim to what exists
            n = max(0, min(n, length, len(ori_s)))
            if n > 0 or pool_ok:
                records.append(
                    (scale_idx, i, k, s, pool_ok, ori_s[:n], ori_e[:n]))
        acum_layers += stride * (len(layers) + 1)
    return records


def sparse_map_mask(num_clips: int, num_scale_layers: Sequence[int]) -> np.ndarray:
    mask = np.zeros((num_clips, num_clips), np.float32)
    for rec in sparse_map_layout(num_clips, num_scale_layers):
        s_idx, e_idx = rec[5], rec[6]
        mask[s_idx, e_idx] = 1
    return mask


def _max_pool1d(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """torch.nn.MaxPool1d semantics on (B, L, C)."""
    if kernel == 1 and stride == 1:
        return x
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, 1), window_strides=(1, stride, 1),
        padding="VALID",
    )


class SparsePropMaxPool(nn.Module):
    """(B, L, C) -> ((B, L, L, C) sparse map, (L, L) static mask)."""

    num_clips: int
    num_scale_layers: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        layout = sparse_map_layout(self.num_clips, self.num_scale_layers)
        map_h = jnp.zeros((b, self.num_clips, self.num_clips, c), x.dtype)
        for _, _, k, s, pool_ok, s_idx, e_idx in layout:
            if pool_ok:
                x = _max_pool1d(x, k, s)
            n = len(s_idx)
            if n > 0:
                map_h = map_h.at[:, jnp.asarray(s_idx), jnp.asarray(e_idx), :].set(
                    x[:, :n, :]
                )
        mask = jnp.asarray(sparse_map_mask(self.num_clips, self.num_scale_layers))
        return map_h, mask


class FrameAvgPool(nn.Module):
    """1x1 conv + relu + avg pool (frame_pool.py:4-19), channel-last."""

    hidden_size: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_size, name="vis_conv")(x))
        if self.kernel == 1 and self.stride == 1:
            return x
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, self.kernel, 1), (1, self.stride, 1), "VALID"
        )
        return summed / self.kernel


class FrameMaxPool(nn.Module):
    """1x1 conv + relu + max pool (frame_pool.py:21-30)."""

    hidden_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_size, name="vis_conv")(x))
        # torch MaxPool1d(stride) => kernel=stride, stride=stride
        return _max_pool1d(x, self.stride, self.stride)


class PropMaxPool(nn.Module):
    """Dense 2D proposal map: diagonal dig_idx fills cell (s, s+dig)
    (prop_modules/dense.py:4-26)."""

    num_clips: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        nc = self.num_clips
        map_h = jnp.zeros((b, nc, nc, c), x.dtype)
        mask = np.zeros((nc, nc), np.float32)
        for dig in range(self.num_layers):
            if dig > 0:
                x = _max_pool1d(x, 2, 1)
            s_idx = list(range(0, nc - dig))
            e_idx = [s + dig for s in s_idx]
            map_h = map_h.at[:, jnp.asarray(s_idx), jnp.asarray(e_idx), :].set(
                x[:, : len(s_idx), :]
            )
            mask[s_idx, e_idx] = 1
        return map_h, jnp.asarray(mask)


class SparsePropConv(nn.Module):
    """Conv variant of the sparse multi-scale cascade
    (prop_modules/sparse.py:69-125): same scatter layout, learned Conv1d
    stages instead of max pools."""

    num_clips: int
    num_scale_layers: Tuple[int, ...]
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        layout = sparse_map_layout(self.num_clips, self.num_scale_layers)
        map_h = jnp.zeros((b, self.num_clips, self.num_clips, self.hidden_size),
                          x.dtype)
        for scale_idx, layer_idx, k, s, pool_ok, s_idx, e_idx in layout:
            if pool_ok:  # reference try/except: a failing conv leaves x as-is
                x = nn.Conv(
                    self.hidden_size, (k,), strides=(s,), padding="VALID",
                    name=f"conv_{scale_idx}_{layer_idx}",
                )(x)
            n = min(len(s_idx), x.shape[1])
            if n > 0:
                map_h = map_h.at[:, jnp.asarray(s_idx[:n]), jnp.asarray(e_idx[:n]), :].set(
                    x[:, :n, :]
                )
        mask = jnp.asarray(sparse_map_mask(self.num_clips, self.num_scale_layers))
        return map_h, mask


class LstmTextEncoder(nn.Module):
    """Stacked unidirectional LSTM; returns output at the last valid token
    (base_fusion.py:18-22)."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, tokens, mask):
        h = tokens
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{i}")
            h = nn.RNN(cell, name=f"rnn_{i}")(h)
            h = h * mask[..., None]
        last = jnp.maximum(mask.sum(-1).astype(jnp.int32) - 1, 0)  # (B,)
        return h[jnp.arange(h.shape[0]), last]  # (B, H)


class BaseFusion(nn.Module):
    """txt(last LSTM state) x conv'd map, L2-normalized Hadamard
    (base_fusion.py:6-26)."""

    hidden_size: int
    txt_hidden_size: int
    lstm_layers: int

    @nn.compact
    def __call__(self, tokens, tok_mask, map_h, map_mask):
        txt = LstmTextEncoder(self.txt_hidden_size, self.lstm_layers,
                              name="textual_encoder")(tokens, tok_mask)
        txt = nn.Dense(self.hidden_size, name="tex_linear")(txt)  # (B, H)
        vis = nn.Dense(self.hidden_size, name="vis_conv")(map_h)  # 1x1 conv
        fused = txt[:, None, None, :] * vis
        # safe L2-normalize: sqrt at exactly-zero cells would give NaN
        # gradients even behind a `maximum` (0 * d(sqrt(0)) = NaN)
        n2 = jnp.sum(fused * fused, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.where(n2 > 0, n2, 1.0))
        fused = jnp.where(n2 > 0, fused * inv, 0.0)
        return fused * map_mask[None, :, :, None]


class MapConv(nn.Module):
    """Stacked mask-renormalized 2D convs (map_conv.py:6-33)."""

    hidden_sizes: Tuple[int, ...]
    kernel_sizes: Tuple[int, ...]
    paddings: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, mask):
        # mask: (S, E) static 0/1
        m = mask[None, :, :, None]
        for i, (h, k, p) in enumerate(
            zip(self.hidden_sizes, self.kernel_sizes, self.paddings)
        ):
            x = nn.relu(
                nn.Conv(h, (k, k), padding=[(p, p), (p, p)], name=f"conv_{i}")(x)
            )
            count = jax.lax.reduce_window(
                m, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
                [(0, 0), (p, p), (p, p), (0, 0)],
            )
            count = jnp.round(count)
            weight = jnp.where(count > 0, 1.0 / jnp.where(count > 0, count, 1.0), 0.0)
            x = x * weight
            m = (weight > 0).astype(x.dtype)
        return x


class ConeTanModel(nn.Module):
    """CONE_TAN: 2D score map head + shared matching/adapter branch."""

    cfg: TanConfig

    def setup(self):
        c = self.cfg
        if getattr(c, "frame_module", "avg") == "max":
            self.frame_layer = FrameMaxPool(
                c.hidden_size, c.frame_stride, name="frame_layer"
            )
        else:
            self.frame_layer = FrameAvgPool(
                c.hidden_size, c.frame_kernel, c.frame_stride, name="frame_layer"
            )
        prop = getattr(c, "prop_module", "sparse_pool")
        if prop == "sparse_conv":
            self.prop_layer = SparsePropConv(
                c.num_clips, tuple(c.num_scale_layers), c.hidden_size,
                name="prop_layer",
            )
        elif prop == "dense_pool":
            self.prop_layer = PropMaxPool(
                c.num_clips, getattr(c, "dense_num_layers", 16), name="prop_layer"
            )
        else:
            self.prop_layer = SparsePropMaxPool(
                c.num_clips, tuple(c.num_scale_layers), name="prop_layer"
            )
        self.fusion_layer = BaseFusion(
            c.hidden_size, c.txt_hidden_size, c.lstm_layers, name="fusion_layer"
        )
        self.map_layer = MapConv(
            tuple(c.map_hidden_sizes), tuple(c.map_kernel_sizes),
            tuple(c.map_paddings), name="map_layer",
        )
        self.pred_layer = nn.Dense(1, name="pred_layer")
        if c.adapter_module == "linear":
            from cone_tpu.models.cone import MLP

            self.adapter_layer = MLP(c.hidden_size, c.v_feat_dim, 2,
                                     name="adapter_layer")

    def __call__(self, tokens, tok_mask, visual_input):
        """tokens (B, Lq, Dt), tok_mask (B, Lq), visual_input (B, L, Dv)
        -> (scores (B, S, E), map_mask (S, E))."""
        vis_h = self.frame_layer(visual_input)
        map_h, map_mask = self.prop_layer(vis_h)
        fused = self.fusion_layer(tokens, tok_mask, map_h, map_mask)
        fused = self.map_layer(fused, map_mask)
        pred = self.pred_layer(fused)[..., 0] * map_mask[None]
        return pred, map_mask

    # ---- shared matching / adapter branch (cone_tan.py:40-119) --------

    def adapt(self, feat):
        if self.cfg.adapter_module == "linear":
            return self.adapter_layer(feat) + feat
        return feat

    def clip_matching_gt(self, src_cls_txt, src_vid_appear, proposal_start,
                         proposal_end):
        from cone_tpu.ops.pooling import matching_sim_gt

        return matching_sim_gt(self.adapt, src_cls_txt, src_vid_appear,
                               proposal_start, proposal_end)

    def clip_matching_pred(self, src_cls_txt, src_vid_appear, proposal_start,
                           proposal_end):
        """Integer proposal cells (B, K) -> (B, K) matching scores."""
        from cone_tpu.ops.pooling import (masked_segment_mean,
                                          matching_scores_pred)

        pooled = masked_segment_mean(src_vid_appear, proposal_start,
                                     proposal_end)
        return matching_scores_pred(self.adapt, src_cls_txt, pooled)

    def init_all(self, tokens, tok_mask, visual_input, src_cls_txt,
                 src_vid_appear):
        out = self.__call__(tokens, tok_mask, visual_input)
        b = src_vid_appear.shape[0]
        _ = self.clip_matching_gt(
            src_cls_txt, src_vid_appear,
            jnp.zeros((b,), jnp.int32), jnp.ones((b,), jnp.int32),
        )
        return out


def bce_rescale_loss(scores, map_mask, targets, min_iou=0.3, max_iou=0.7,
                     bias=0.5):
    """Scaled-IoU BCE over the valid map cells (loss.py:5-44).

    scores: (B, S, E) raw logits; targets: (B, S, E) IoU values in [0, 1].
    """
    joint_prob = jax.nn.sigmoid(scores) * map_mask[None]
    target_prob = (targets - min_iou) * (1 - bias) / (max_iou - min_iou)
    target_prob = jnp.where(target_prob > 0, target_prob + bias, target_prob)
    target_prob = jnp.clip(target_prob, 0.0, 1.0)
    eps = 1e-12
    bce = -(
        target_prob * jnp.log(jnp.clip(joint_prob, eps, 1.0))
        + (1 - target_prob) * jnp.log(jnp.clip(1 - joint_prob, eps, 1.0))
    )
    bce = bce * map_mask[None]
    return bce.sum() / (map_mask.sum() * scores.shape[0]), joint_prob


def iou_target_map(num_clips: int, start_pos: float, end_pos: float) -> np.ndarray:
    """IoU (hull-union convention, lib/core/eval.py:9-27) of every map cell
    [s, e+1] vs the window-local GT span (lib/datasets/ego4d.py:133-141)."""
    s = np.arange(num_clips, dtype=np.float64)[:, None]
    e = np.arange(1, num_clips + 1, dtype=np.float64)[None, :]
    inter = np.maximum(0.0, np.minimum(e, end_pos) - np.maximum(s, start_pos))
    union = np.maximum(0.0, np.maximum(e, end_pos) - np.minimum(s, start_pos))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out.astype(np.float32)
