"""DETR-style transformer in flax.linen, batch-major, shape-static.

Functionally equivalent to the reference stack (cone/transformer.py:18-353):
post-norm (default) encoder/decoder, positional embeddings added to Q/K only
(never V), decoder returning every intermediate layer's output passed through
the shared final LayerNorm (for auxiliary losses). No (L, B, D) permutes —
everything is (B, L, D), which is what XLA wants on TPU anyway.

Attention parameters are stored packed exactly like
torch.nn.MultiheadAttention (one (D, 3D) in-projection + out-projection), so
reference checkpoints convert with a pure transpose (tools/convert_ckpt.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e30


class PackedInProj(nn.Module):
    """torch-packed (D, 3D) QKV in-projection, applied column-sliced.

    DETR adds pos embeds to Q/K but never V, so the three projection inputs
    are *different tensors* and the packed matmul cannot be shared across
    them; projecting each input through the full (D, 3D) kernel and slicing
    the output (what a literal torch translation does) computes and discards
    2/3 of the columns. Slicing the KERNEL instead does only the needed
    columns — bitwise-identical results, ~1/3 of the fine-stage projection
    FLOPs saved. Param tree/layout stays exactly torch-packed
    (tools/convert_ckpt.py reads {kernel: (D, 3D), bias: (3D,)})."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.d_model, 3 * self.d_model), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (3 * self.d_model,),
            jnp.float32,
        )
        return (
            x.astype(self.dtype) @ kernel[:, lo:hi].astype(self.dtype)
            + bias[lo:hi].astype(self.dtype)
        )


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (packed in_proj)."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Lq, D)
        key: jnp.ndarray,    # (B, Lk, D)
        value: jnp.ndarray,  # (B, Lk, D)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True=IGNORE
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d, h = self.d_model, self.nhead
        head_dim = d // h
        in_proj = PackedInProj(d, dtype=self.dtype, name="in_proj")
        # packed like torch: columns [q | k | v]; self-attention (query is
        # key, a trace-time identity) fuses the q/k columns into one matmul
        if query is key:
            qk = in_proj(query, 0, 2 * d)
            q, k = qk[..., :d], qk[..., d:]
        else:
            q = in_proj(query, 0, d)
            k = in_proj(key, d, 2 * d)
        v = in_proj(value, 2 * d, 3 * d)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)  # (B, H, L, hd)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * (head_dim**-0.5), k)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, logits
            )
        weights = nn.softmax(logits, axis=-1)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        b, _, lq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, name="out_proj", dtype=self.dtype)(out)


class _FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, name="linear2", dtype=self.dtype)(y)
        return y


class EncoderLayer(nn.Module):
    """cone/transformer.py:211-268 (post-norm default)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, key_padding_mask, pos, deterministic=True):
        attn = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype, name="self_attn"
        )
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dropout, self.dtype,
                   name="ffn")
        # epsilon=1e-5 (torch nn.LayerNorm default) rather than flax's 1e-6,
        # here and in every CONE-family norm: at init the decoder layer-0
        # self-attn block output is exactly zero (zero-init attention
        # biases), so that norm's input has zero variance and the BACKWARD
        # scales by 1/sqrt(eps) — a 1e-6 eps makes early-training gradients
        # sqrt(10)x the reference's while every forward output still
        # matches (tests/test_train_parity.py).
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if self.pre_norm:
            src2 = norm1(src)
            qk = src2 + pos
            src = src + drop(attn(qk, qk, src2, key_padding_mask, deterministic))
            src2 = norm2(src)
            src = src + drop(ffn(src2, deterministic))
            return src
        qk = src + pos
        src = norm1(src + drop(attn(qk, qk, src, key_padding_mask, deterministic)))
        src = norm2(src + drop(ffn(src, deterministic)))
        return src


class DecoderLayer(nn.Module):
    """cone/transformer.py:271-353 (post-norm default)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_key_padding_mask, pos, query_pos,
                 deterministic=True):
        self_attn = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype, name="self_attn"
        )
        cross_attn = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype, name="multihead_attn"
        )
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dropout, self.dtype,
                   name="ffn")
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if self.pre_norm:
            tgt2 = norm1(tgt)
            qk = tgt2 + query_pos
            tgt = tgt + drop(self_attn(qk, qk, tgt2, None, deterministic))
            tgt2 = norm2(tgt)
            tgt = tgt + drop(
                cross_attn(tgt2 + query_pos, memory + pos, memory,
                           memory_key_padding_mask, deterministic)
            )
            tgt2 = norm3(tgt)
            tgt = tgt + drop(ffn(tgt2, deterministic))
            return tgt
        qk = tgt + query_pos
        tgt = norm1(tgt + drop(self_attn(qk, qk, tgt, None, deterministic)))
        tgt = norm2(
            tgt + drop(
                cross_attn(tgt + query_pos, memory + pos, memory,
                           memory_key_padding_mask, deterministic)
            )
        )
        tgt = norm3(tgt + drop(ffn(tgt, deterministic)))
        return tgt


class DetrTransformer(nn.Module):
    """Encoder + decoder returning all intermediate decoder states.

    Reference: cone/transformer.py:18-73 with return_intermediate_dec=True
    (build_transformer, :450-471).
    """

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 1024
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, query_embed, pos_embed, deterministic=True):
        """
        Args:
            src: (B, L, D) fused video+text tokens.
            mask: (B, L) float/bool, 1 = valid (converted internally to the
                key-padding convention).
            query_embed: (NQ, D) learnable moment queries.
            pos_embed: (B, L, D).

        Returns:
            hs: (num_decoder_layers, B, NQ, D) intermediate decoder outputs
                (each passed through the shared final norm).
            memory: (B, L, D) encoder output.
        """
        key_padding = jnp.logical_not(mask.astype(bool))  # True = pad

        out = src
        for i in range(self.num_encoder_layers):
            out = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.pre_norm, self.dtype, name=f"encoder_layer_{i}",
            )(out, key_padding, pos_embed, deterministic)
        if self.pre_norm:
            out = nn.LayerNorm(epsilon=1e-5, name="encoder_norm")(out)
        memory = out

        b = src.shape[0]
        q = jnp.broadcast_to(query_embed[None], (b,) + query_embed.shape)
        tgt = jnp.zeros_like(q)
        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        intermediate = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.pre_norm, self.dtype, name=f"decoder_layer_{i}",
            )(tgt, memory, key_padding, pos_embed, q, deterministic)
            intermediate.append(decoder_norm(tgt))
        hs = jnp.stack(intermediate)  # (#layers, B, NQ, D)
        return hs, memory
