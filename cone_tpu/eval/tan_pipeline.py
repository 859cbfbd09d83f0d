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
from cone_tpu.models.tan import ConeTanModel, TanConfig, sparse_map_mask
from cone_tpu.ops.windows import slice_windows


class TanInferencePipeline(InferencePipeline):
    nms_hull = False  # 2D-TAN's nms uses standard union IoU (eval.py:34-56)

    def __init__(self, model: ConeTanModel, params, dataset, cfg: ConeConfig,
                 tan_cfg: TanConfig, proposal_top_k: int = 10, mesh=None):
        self.tan_cfg = tan_cfg
        self.proposal_top_k = proposal_top_k
        super().__init__(model, params, dataset, cfg, mesh=mesh)

    def _make_fine_fn(self):
        cfg = self.cfg
        model = self.model
        stride, max_v_l = self.stride, cfg.data.max_v_l
        clip_len = cfg.data.clip_length
        top_p = self.proposal_top_k
        nc = self.tan_cfg.num_clips
        assert nc == max_v_l, "TAN num_clips must equal the window length"
        cell_mask = jnp.asarray(
            sparse_map_mask(nc, self.tan_cfg.num_scale_layers).reshape(-1)
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

            scores, _ = model.apply({"params": params}, tok, tmask, mo)
            prob = jax.nn.sigmoid(scores).reshape(qc * k, nc * nc)
            prob = jnp.where(cell_mask[None].astype(bool), prob, -1.0)
            top_prob, top_idx = jax.lax.top_k(prob, top_p)  # (B, P)
            s_cell = top_idx // nc
            e_cell = top_idx % nc + 1  # cell (s, e) covers clips [s, e+1)

            matching = model.apply(
                {"params": params}, cls, ap, s_cell, e_cell,
                method=ConeTanModel.clip_matching_pred,
            )
            spans_clip = jnp.stack([s_cell, e_cell], axis=-1).astype(jnp.float32)
            sec = (
                spans_clip + wstart.reshape(-1)[:, None, None]
            ) * clip_len
            return (
                sec.reshape(qc, k, top_p, 2),
                top_prob.reshape(qc, k, top_p),
                matching.reshape(qc, k, top_p),
            )

        return fine_fn
