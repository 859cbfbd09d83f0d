"""CLIP towers (vision + text) in flax — TPU-native feature extraction.

Functional equivalents of the reference's vendored OpenAI CLIP
(feature_extraction/clip/model.py: `encode_image` :336-337 via the ViT
`visual` tower, `encode_text` :339-352) in the HuggingFace weight layout
(the converters below consume `CLIPVisionModelWithProjection` /
`CLIPTextModelWithProjection` state dicts, which are the released OpenAI
weights re-keyed).

This upgrades the offline CLIP extraction stack (SURVEY §2.3) the same way
models/egovlp.py upgraded the EgoVLP demo backbone: the reference extracts
MAD video/text features on a GPU with torch
(feature_extraction/clip_extractor.py:22-54); here both towers are
jittable/shardable jax, so extraction runs on the TPU mesh. Host-side work
is reduced to ffmpeg decode + tokenization.

Feature semantics match the reference exactly:
  * image feature  = visual_projection(post_layernorm(CLS))      (512-d)
  * token features = final_layer_norm(hidden states), ONE application
                     (clip/model.py:346 — `ln_final` exactly once)
  * text cls (EOT) = text_projection(token features at the EOT position)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5


def quick_gelu(x):
    """OpenAI CLIP's activation (HF `hidden_act="quick_gelu"`)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    """Multi-head self-attention, HF CLIPAttention layout
    (separate q/k/v/out projections, scale on q)."""

    dim: int
    num_heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, valid: Optional[jnp.ndarray] = None):
        b, l, d = x.shape
        h = self.num_heads
        hd = d // h

        def heads(t):
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)  # (B,H,L,hd)

        q = heads(nn.Dense(d, name="q_proj")(x)) * (hd ** -0.5)
        k = heads(nn.Dense(d, name="k_proj")(x))
        v = heads(nn.Dense(d, name="v_proj")(x))

        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        neg = jnp.finfo(sim.dtype).min
        if self.causal:
            causal = jnp.tril(jnp.ones((l, l), bool))
            sim = jnp.where(causal[None, None], sim, neg)
        if valid is not None:  # (B, L) True = real token (key-side mask)
            sim = jnp.where(valid[:, None, None, :], sim, neg)
        w = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, name="out_proj")(out)


class ClipEncoderLayer(nn.Module):
    """Pre-LN block: x + attn(LN1(x)); x + mlp(LN2(x)) with quick_gelu."""

    dim: int
    num_heads: int
    intermediate: int
    eps: float
    causal: bool = False

    @nn.compact
    def __call__(self, x, valid=None):
        x = x + ClipAttention(self.dim, self.num_heads, self.causal,
                              name="self_attn")(
            nn.LayerNorm(epsilon=self.eps, name="layer_norm1")(x), valid)
        y = nn.LayerNorm(epsilon=self.eps, name="layer_norm2")(x)
        y = nn.Dense(self.intermediate, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class ClipVisionTower(nn.Module):
    """(B, H, W, 3) preprocessed pixels -> (B, projection_dim) image
    features (the reference's `encode_image`, clip/model.py:336-337)."""

    cfg: ClipVisionConfig

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        b = pixels.shape[0]
        n_side = c.image_size // c.patch_size
        n = n_side * n_side

        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=False, name="patch_embedding")(pixels)
        x = x.reshape(b, n, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n + 1, c.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layernorm")(x)
        for i in range(c.num_layers):
            x = ClipEncoderLayer(c.hidden_size, c.num_heads,
                                 c.intermediate_size, c.layer_norm_eps,
                                 name=f"layer_{i}")(x)
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False,
                        name="visual_projection")(pooled)


class ClipTextTower(nn.Module):
    """(B, L) token ids + (B,) EOT positions + (B, L) validity ->
    (token features (B, L, D), projected EOT cls (B, projection_dim)).

    Token features are `final_layer_norm` hidden states — applied ONCE,
    like the reference's `ln_final` (clip/model.py:346). The EOT feature
    goes through `text_projection` (:350)."""

    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, ids, eot_idx, valid=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.hidden_size))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.context_length, c.hidden_size))
        l = ids.shape[1]
        x = jnp.take(jnp.asarray(tok), ids, axis=0) + jnp.asarray(pos)[None, :l]
        for i in range(c.num_layers):
            x = ClipEncoderLayer(c.hidden_size, c.num_heads,
                                 c.intermediate_size, c.layer_norm_eps,
                                 causal=True, name=f"layer_{i}")(x, valid)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        eot = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        cls = nn.Dense(c.projection_dim, use_bias=False,
                       name="text_projection")(eot)
        return x, cls


# ------------------------------------------------------------ converters


def _np(t):
    import numpy as np

    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _dense(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T.copy(),
            "bias": _np(sd[f"{name}.bias"]).copy()}


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]).copy(),
            "bias": _np(sd[f"{name}.bias"]).copy()}


def _layers(sd, prefix, n):
    out = {}
    for i in range(n):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
            "self_attn": {k: _dense(sd, f"{p}.self_attn.{k}")
                          for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        }
    return out


def clip_vision_state_dict_to_params(sd: dict, num_layers: int) -> dict:
    """HF `CLIPVisionModelWithProjection.state_dict()` -> ClipVisionTower
    params. Conv kernel (D,3,p,p) -> flax HWIO (p,p,3,D)."""
    vm = "vision_model"
    params = {
        "patch_embedding": {
            "kernel": _np(sd[f"{vm}.embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0).copy(),
        },
        "class_embedding": _np(sd[f"{vm}.embeddings.class_embedding"]).copy(),
        "position_embedding":
            _np(sd[f"{vm}.embeddings.position_embedding.weight"]).copy(),
        "pre_layernorm": _ln(sd, f"{vm}.pre_layrnorm"),  # HF's spelling
        "post_layernorm": _ln(sd, f"{vm}.post_layernorm"),
        "visual_projection": {
            "kernel": _np(sd["visual_projection.weight"]).T.copy()},
    }
    params.update(_layers(sd, f"{vm}.encoder", num_layers))
    return params


def clip_text_state_dict_to_params(sd: dict, num_layers: int) -> dict:
    """HF `CLIPTextModelWithProjection.state_dict()` -> ClipTextTower params."""
    tm = "text_model"
    params = {
        "token_embedding":
            _np(sd[f"{tm}.embeddings.token_embedding.weight"]).copy(),
        "position_embedding":
            _np(sd[f"{tm}.embeddings.position_embedding.weight"]).copy(),
        "final_layer_norm": _ln(sd, f"{tm}.final_layer_norm"),
        "text_projection": {
            "kernel": _np(sd["text_projection.weight"]).T.copy()},
    }
    params.update(_layers(sd, f"{tm}.encoder", num_layers))
    return params


def vision_config_from_hf(hf_cfg) -> ClipVisionConfig:
    return ClipVisionConfig(
        image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        projection_dim=hf_cfg.projection_dim,
        layer_norm_eps=hf_cfg.layer_norm_eps)


def text_config_from_hf(hf_cfg) -> ClipTextConfig:
    return ClipTextConfig(
        vocab_size=hf_cfg.vocab_size,
        context_length=hf_cfg.max_position_embeddings,
        hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        projection_dim=hf_cfg.projection_dim,
        layer_norm_eps=hf_cfg.layer_norm_eps)
