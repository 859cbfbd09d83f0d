"""Coarse-to-fine inference with the CONE-TAN head.

Shares the coarse window-ranking stage with the CONE pipeline (same adapter
+ similarity scoring); the fine stage scores every valid cell of the 2D
proposal map per window, keeps the top `proposal_top_k` per window
(cone_2dtan config TEST.PROPOSAL_TOP_K), computes matching scores for those
proposals, then flows through the same fusion + NMS post-processing
(cone_2dtan/lib/core/eval.py:123-264 uses the same score-fusion scheme as
cone/inference.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cone_tpu.config import ConeConfig
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.tan import ConeTanModel, TanConfig
from cone_tpu.ops.windows import slice_windows


class TanInferencePipeline(InferencePipeline):
    nms_hull = False  # 2D-TAN's nms uses standard union IoU (eval.py:34-56)

    def __init__(self, model: ConeTanModel, params, dataset, cfg: ConeConfig,
                 tan_cfg: TanConfig, proposal_top_k: int = 10, mesh=None,
                 nms_within_window: bool = True,
                 nms_thresh_within_window: float = 0.3,
                 pre_nms_pool: int = 128):
        """nms_within_window reproduces TEST.USE_NMS_WITHIN_WINDOW (yaml
        default True; NMS_THRESH_WITHIN_WINDOW 0.3, lib/core/config.py:105,
        moment_localization/test.py:285-289): suppress overlapping map cells
        inside each window before keeping the top `proposal_top_k`. The NMS
        pool is bounded to the `pre_nms_pool` best cells (the reference
        scans all ~1.1k; survivors past the 128th never reach the top-10)."""
        self.tan_cfg = tan_cfg
        self.proposal_top_k = proposal_top_k
        self.nms_within_window = nms_within_window
        self.nms_thresh_within_window = nms_thresh_within_window
        self.pre_nms_pool = pre_nms_pool
        super().__init__(model, params, dataset, cfg, mesh=mesh)

    def _make_fine_fn(self):
        cfg = self.cfg
        model = self.model
        stride, max_v_l = self.stride, cfg.data.max_v_l
        clip_len = cfg.data.clip_length
        top_p = self.proposal_top_k
        nc = self.tan_cfg.num_clips
        # TARGET_STRIDE geometry: the raw window is num_clips * frame_stride
        # clips; the frame layer pools it to num_clips map cells
        # (cone_2dtan/lib/datasets/mad.py:150-153 — ego4d stride 1, mad
        # stride 2 with NUM_SAMPLE_CLIPS 128 -> 64x64 map).
        stride_t = self.tan_cfg.frame_stride
        assert nc * stride_t == max_v_l, (
            f"TAN num_clips*frame_stride ({nc}*{stride_t}) must equal the "
            f"window length ({max_v_l})"
        )
        def fine_fn(params, appear, motion, ctx_l, win_idx, q_tok, q_mask, q_cls):
            qc, k = win_idx.shape

            def slice_one(idx):
                a, m, s, l = slice_windows(appear, idx, stride, max_v_l, ctx_l)
                mo, _, _, _ = slice_windows(motion, idx, stride, max_v_l, ctx_l)
                return a, mo, s, l

            ap, mo, wstart, wlen = jax.vmap(slice_one)(win_idx)
            flat = lambda x: x.reshape((qc * k,) + x.shape[2:])
            ap, mo = flat(ap), flat(mo)
            rep = lambda x: jnp.repeat(x, k, axis=0)
            tok, tmask, cls = rep(q_tok), rep(q_mask), rep(q_cls)

            scores, map_mask = model.apply({"params": params}, tok, tmask, mo)
            # the MODEL's own cell mask (sparse cascade / conv / dense each
            # have a different one) — the reference likewise scores
            # sigmoid(prediction) * map_mask (moment_localization/
            # test.py:121-125), so invalid cells carry 0, never 0.5
            prob = (jax.nn.sigmoid(scores) * map_mask[None]).reshape(
                qc * k, nc * nc)

            def top_k_ref_order(x, kk):
                """lax.top_k with the reference's tie order: equal scores
                prefer the HIGHEST flat cell (np.argsort(ravel())[::-1],
                test.py:275-276); top_k alone prefers the lowest."""
                v, ridx = jax.lax.top_k(x[..., ::-1], kk)
                return v, x.shape[-1] - 1 - ridx

            if self.nms_within_window:
                from cone_tpu.ops.nms import temporal_nms_device

                pool = min(self.pre_nms_pool, nc * nc)
                pool_prob, pool_idx = top_k_ref_order(prob, pool)
                ps = (pool_idx // nc).astype(jnp.float32)
                pe = (pool_idx % nc + 1).astype(jnp.float32)
                spans_clip, top_prob, cand_valid = temporal_nms_device(
                    jnp.stack([ps, pe], axis=-1), pool_prob,
                    pool_prob > 0, self.nms_thresh_within_window, top_p,
                    hull_union=False,
                )
                s_cell = spans_clip[..., 0].astype(jnp.int32)
                e_cell = spans_clip[..., 1].astype(jnp.int32)
            else:
                top_prob, top_idx = top_k_ref_order(prob, top_p)  # (B, P)
                s_cell = top_idx // nc
                e_cell = top_idx % nc + 1  # cell (s, e) covers clips [s, e+1)
                spans_clip = jnp.stack([s_cell, e_cell], axis=-1).astype(jnp.float32)
                cand_valid = top_prob > 0

            # map cells -> raw clip units: x TARGET_STRIDE
            # (moment_localization/test.py:293,426); matching pools the raw
            # appearance window over the scaled proposal.
            matching = model.apply(
                {"params": params}, cls, ap, s_cell * stride_t,
                e_cell * stride_t,
                method=ConeTanModel.clip_matching_pred,
            )
            sec = (
                spans_clip * stride_t + wstart.reshape(-1)[:, None, None]
            ) * clip_len
            return (
                sec.reshape(qc, k, top_p, 2),
                top_prob.reshape(qc, k, top_p),
                matching.reshape(qc, k, top_p),
                cand_valid.reshape(qc, k, top_p),
            )

        return fine_fn
