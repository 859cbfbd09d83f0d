"""The CONE grounding model in flax.linen.

Functional equivalent of the reference model (cone/model.py:16-210):
Moment-DETR-style encoder-decoder over [video ; text] token sequence with
learnable moment queries, plus the appearance-branch residual adapter and the
proposal <-> query matching head.

TPU-first differences:
  * batch is (windows x queries) flattened — windows are just rows;
  * proposal mean-pooling is a masked matmul (ops/pooling.py), not a loop;
  * everything static-shape; masks carry validity.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from cone_tpu.config import ModelConfig
from cone_tpu.models.transformer import DetrTransformer
from cone_tpu.ops.pooling import masked_segment_mean, proposal_mean_pool


def sine_position_embedding(mask: jnp.ndarray, num_pos_feats: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """1-D sine embedding from a validity mask, normalized to 2*pi.

    Reference: cone/position_encoding.py:35-72 (normalize=True). The position
    signal is cumsum(mask) so padded slots repeat the last valid position.

    Args:
        mask: (B, L) 1/0 validity.
    Returns:
        (B, L, num_pos_feats) — interleaved [sin, cos, sin, cos, ...].
    """
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)  # (B, L)
    eps = 1e-6
    x_embed = x_embed / (x_embed[:, -1:] + eps) * (2 * math.pi)

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t  # (B, L, F)
    interleaved = jnp.stack(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(pos_x.shape)
    return interleaved


class LinearLayer(nn.Module):
    """[LayerNorm ->] Dropout -> Dense [-> ReLU] (cone/model.py:443-465)."""

    out_dim: int
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="LayerNorm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, name="linear", dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Plain ReLU MLP (cone/model.py:428-440)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layer_{i}", dtype=self.dtype)(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class TrainableTextPos(nn.Module):
    """Learned text position embedding (cone/position_encoding.py:10-32)."""

    max_len: int
    hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, l, _ = x.shape
        table = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (self.max_len, self.hidden),
        )
        emb = nn.LayerNorm(epsilon=1e-5, name="LayerNorm")(x + table[None, :l])
        return nn.Dropout(self.dropout)(emb, deterministic=deterministic)


class ConeModel(nn.Module):
    """CONE: span prediction + saliency + proposal-query matching.

    Methods:
      __call__            — Moment-DETR forward over one window batch
                            (cone/model.py:82-128).
      clip_matching_gt    — GT-proposal matching logits for the adapter NCE
                            (cone/model.py:130-148, 154-176).
      clip_matching_pred  — predicted-proposal matching scores at inference
                            (cone/model.py:149-152, 178-210).
      adapt               — residual adapter on appearance features, used by
                            the coarse stage (cone/inference.py:254-258).
    """

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        relu_args = [True, True, True]
        relu_args[c.n_input_proj - 1] = False
        self.input_txt_proj = [
            LinearLayer(
                c.hidden_dim, layer_norm=True, dropout=c.input_dropout,
                relu=relu_args[i], dtype=dtype, name=f"input_txt_proj_{i}",
            )
            for i in range(c.n_input_proj)
        ]
        self.input_vid_proj = [
            LinearLayer(
                c.hidden_dim, layer_norm=True, dropout=c.input_dropout,
                relu=relu_args[i], dtype=dtype, name=f"input_vid_proj_{i}",
            )
            for i in range(c.n_input_proj)
        ]
        self.transformer = DetrTransformer(
            d_model=c.hidden_dim,
            nhead=c.nheads,
            num_encoder_layers=c.enc_layers,
            num_decoder_layers=c.dec_layers,
            dim_feedforward=c.dim_feedforward,
            dropout=c.dropout,
            pre_norm=c.pre_norm,
            dtype=dtype,
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (c.num_queries, c.hidden_dim)
        )
        self.span_embed = MLP(c.hidden_dim, 2, 3, dtype=dtype, name="span_embed")
        self.class_embed = nn.Dense(2, name="class_embed", dtype=dtype)
        self.saliency_proj = nn.Dense(1, name="saliency_proj", dtype=dtype)
        if c.use_txt_pos:
            self.txt_position_embed = TrainableTextPos(
                c.max_q_l, c.hidden_dim, c.input_dropout, name="txt_position_embed"
            )
        if c.adapter_module == "linear":
            self.adapter_layer = MLP(
                c.hidden_dim, c.v_appear_feat_dim, 2, dtype=dtype, name="adapter_layer"
            )

    def __call__(self, src_txt, src_txt_mask, src_vid_motion, src_vid_motion_mask,
                 deterministic: bool = True):
        """One window batch forward.

        Args:
            src_txt: (B, Lq, Dt), src_txt_mask: (B, Lq) 1=valid.
            src_vid_motion: (B, Lv, Dv), src_vid_motion_mask: (B, Lv) 1=valid.

        Returns dict:
            pred_logits (B, NQ, 2), pred_spans (B, NQ, 2) sigmoid cxw,
            saliency_scores (B, Lv),
            aux: list of {pred_logits, pred_spans} per earlier decoder layer.
        """
        c = self.cfg
        vid = src_vid_motion
        txt = src_txt
        for layer in self.input_vid_proj:
            vid = layer(vid, deterministic=deterministic)
        for layer in self.input_txt_proj:
            txt = layer(txt, deterministic=deterministic)

        src = jnp.concatenate([vid, txt], axis=1)
        mask = jnp.concatenate([src_vid_motion_mask, src_txt_mask], axis=1)

        pos_vid = sine_position_embedding(src_vid_motion_mask, c.hidden_dim)
        if c.use_txt_pos:
            pos_txt = self.txt_position_embed(txt, deterministic=deterministic)
        else:
            pos_txt = jnp.zeros_like(txt)
        pos = jnp.concatenate([pos_vid, pos_txt], axis=1)

        if c.seq_pad_multiple > 1 and deterministic:
            # pad the encoder sequence to a sublane-friendly length: on v5e
            # the attention core at L=110 (ego4d window 90 + query 20) runs
            # ~20% SLOWER than at L=112 (bf16 sublane multiple 16) — masked
            # positions contribute exactly zero, so valid outputs are
            # unchanged (tools/bench_seqpad.py matrix; tests/
            # test_model_parity.py pins equality). Inference-only
            # (deterministic is static at trace time): the train step's
            # backward measured a slight net loss from the extra positions.
            extra = (-src.shape[1]) % c.seq_pad_multiple
            if extra:
                pad3 = ((0, 0), (0, extra), (0, 0))
                src = jnp.pad(src, pad3)
                pos = jnp.pad(pos, pad3)
                mask = jnp.pad(mask, ((0, 0), (0, extra)))

        hs, memory = self.transformer(
            src, mask, self.query_embed, pos, deterministic=deterministic
        )
        outputs_class = self.class_embed(hs)  # (#layers, B, NQ, 2)
        outputs_coord = self.span_embed(hs)
        if c.span_loss_type == "l1":
            outputs_coord = nn.sigmoid(outputs_coord)

        lv = src_vid_motion.shape[1]
        vid_mem = memory[:, :lv]
        out = {
            "pred_logits": outputs_class[-1].astype(jnp.float32),
            "pred_spans": outputs_coord[-1].astype(jnp.float32),
            "saliency_scores": self.saliency_proj(vid_mem).squeeze(-1).astype(jnp.float32),
            "aux_outputs": [
                {
                    "pred_logits": a.astype(jnp.float32),
                    "pred_spans": b.astype(jnp.float32),
                }
                for a, b in zip(outputs_class[:-1], outputs_coord[:-1])
            ],
        }
        return out

    def init_all(self, src_txt, src_txt_mask, src_vid_motion, src_vid_motion_mask,
                 src_cls_txt, src_vid_appear, src_vid_appear_mask):
        """Touch every submodule so `.init(method=ConeModel.init_all)` creates
        the full parameter tree (linen only materializes what a method uses)."""
        out = self.__call__(src_txt, src_txt_mask, src_vid_motion,
                            src_vid_motion_mask, deterministic=True)
        b = src_vid_appear.shape[0]
        start = jnp.zeros((b,), jnp.int32)
        end = jnp.ones((b,), jnp.int32)
        _ = self.clip_matching_gt(src_cls_txt, src_vid_appear, start, end)
        _ = self.clip_matching_pred(
            src_cls_txt, src_vid_appear, src_vid_appear_mask, out["pred_spans"]
        )
        return out

    # ---- matching / adapter branch ------------------------------------

    def adapt(self, feat):
        """Residual adapter: adapter(x) + x (cone/model.py:171-174)."""
        if self.cfg.adapter_module == "linear":
            return self.adapter_layer(feat) + feat
        return feat

    def clip_matching_gt(self, src_cls_txt, src_vid_appear, proposal_start,
                         proposal_end):
        """Similarity matrix between GT-proposal features and text CLS.

        Args:
            src_cls_txt: (B, D) text CLS features.
            src_vid_appear: (B, L, D) appearance features.
            proposal_start/end: (B,) int clip indices of the GT span.

        Returns:
            (B, B) logits_per_video, matching cone/model.py:142-148.
        """
        from cone_tpu.ops.pooling import matching_sim_gt

        return matching_sim_gt(self.adapt, src_cls_txt, src_vid_appear,
                               proposal_start, proposal_end)

    def clip_matching_pred(self, src_cls_txt, src_vid_appear, src_vid_appear_mask,
                           pred_spans_cxw):
        """Per-proposal matching scores at inference (cone/model.py:149-152).

        Returns:
            (B, NQ) cosine similarity per predicted proposal.
        """
        from cone_tpu.ops.pooling import matching_scores_pred

        pooled = proposal_mean_pool(src_vid_appear, src_vid_appear_mask, pred_spans_cxw)
        return matching_scores_pred(self.adapt, src_cls_txt, pooled)
