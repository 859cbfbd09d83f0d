"""End-to-end demo predictor: video file + query text -> ranked moments.

Counterpart of run_on_video/run.py CONEPredictor: extract clip features
(cached to disk like the reference's .pt cache, run.py:30-38), extract text
features, localize with the batched pipeline.

Two extraction backends:

  * "clip" — CLIP towers; `clip_engine="torch"` runs HF torch on host,
    `clip_engine="flax"` runs the parity-tested flax towers
    (models/clip.py) on the accelerator, making the whole demo path
    TPU-native (ffmpeg decode + tokenization stay on host).
  * "egovlp" — the reference demo's actual backbone
    (run_on_video/run.py:10-40, egovlp_extrator.py:99-150): video runs on
    the accelerator through the parity-tested flax EgoVlpVideoTower
    (models/egovlp.py); text is DistilBERT tokens + the checkpoint's
    txt_proj CLS (host torch, like the reference's text tower).

The localization path is pure cone_tpu either way.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np

from cone_tpu.config import ConeConfig
from cone_tpu.serve.localizer import OnlineLocalizer
from cone_tpu.utils.io import l2_normalize


class MomentPredictor:
    def __init__(self, model, params, cfg: ConeConfig,
                 backend: str = "clip",
                 clip_model_name: str = "openai/clip-vit-base-patch32",
                 fps: Optional[float] = None,
                 cache_dir: str = "feature_cache",
                 egovlp_checkpoint: Optional[str] = None,
                 egovlp_cfg=None,
                 egovlp_params=None,
                 text_model_name: str = "distilbert-base-uncased",
                 frames_per_clip: int = 4,
                 clip_engine: str = "torch",
                 clip_models: Optional[dict] = None):
        """backend="egovlp" extras: `egovlp_checkpoint` (released .pth —
        both towers' weights come from it) OR a ready `egovlp_params` tree
        with its `egovlp_cfg` (tests / pre-converted checkpoints). `fps` is
        the CLIP frame rate or the EgoVLP *clip* rate; EgoVLP decodes
        frames_per_clip frames per clip window like the reference
        (egovlp_extrator.py:120-135).

        backend="clip" extras: `clip_engine` picks host torch vs the flax
        towers on the jax device; `clip_models` injects preloaded
        {"text", "tokenizer", "vision", "processor"} instances (tests /
        pre-warmed servers)."""
        assert backend in ("clip", "egovlp"), backend
        self.cfg = cfg
        self.backend = backend
        self.clip_engine = clip_engine
        self._clip_models = clip_models or {}
        self._vision_backend = None
        self.localizer = OnlineLocalizer(model, params, cfg)
        self.clip_model_name = clip_model_name
        self.fps = fps if fps is not None else 1.0 / cfg.data.clip_length
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._text_backend = None
        self.frames_per_clip = frames_per_clip
        self.text_model_name = text_model_name
        self.egovlp_checkpoint = egovlp_checkpoint
        if egovlp_cfg is None and backend == "egovlp":
            from cone_tpu.models.egovlp import EgoVlpConfig

            egovlp_cfg = EgoVlpConfig()
        self.egovlp_cfg = egovlp_cfg
        self._egovlp = (egovlp_params, None) if egovlp_params is not None else None

    # ---- feature extraction (host, torch) ------------------------------

    def _video_cache_path(self, video_path: str) -> str:
        # clip_engine is part of the key: torch and flax towers agree only
        # to ~2e-3, so serving one engine the other's cached features would
        # silently defeat exactness comparisons
        tag = (f"{self.clip_model_name}:{self.clip_engine}"
               if self.backend == "clip"
               else f"egovlp:{self.egovlp_checkpoint}:"
                    f"{self.frames_per_clip}:{self.egovlp_cfg}")
        key = hashlib.sha1(
            f"{os.path.abspath(video_path)}:{tag}:{self.fps}".encode()
        ).hexdigest()[:16]
        return os.path.join(self.cache_dir, f"vid_{key}.npy")

    def _egovlp_tower(self):
        """(params, jitted forward) for the flax video tower, built once."""
        import jax

        from cone_tpu.models.egovlp import EgoVlpVideoTower

        if self._egovlp is None:
            from cone_tpu.extract.egovlp_video import load_egovlp_params

            assert self.egovlp_checkpoint, (
                "backend='egovlp' needs egovlp_checkpoint or egovlp_params")
            self._egovlp = (
                load_egovlp_params(self.egovlp_checkpoint, self.egovlp_cfg),
                None,
            )
        params, fwd = self._egovlp
        if fwd is None:
            model = EgoVlpVideoTower(self.egovlp_cfg)
            fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
            self._egovlp = (params, fwd)
        return self._egovlp

    def _egovlp_video_features(self, video_path: str) -> np.ndarray:
        """Decode frames_per_clip frames per clip window at the configured
        clip rate, batch them through the flax SpaceTimeTransformer on the
        accelerator (the reference's batch-4 compute_video loop,
        egovlp_extrator.py:120-135, vectorized)."""
        import jax.numpy as jnp

        from cone_tpu.extract.egovlp_video import IMAGENET_MEAN, IMAGENET_STD
        from cone_tpu.extract.video import decode_frames

        e = self.egovlp_cfg
        frame_fps = self.fps * self.frames_per_clip
        frames = decode_frames(video_path, frame_fps, size=e.img_size)
        t = len(frames) // self.frames_per_clip * self.frames_per_clip
        clips = frames[:t].reshape(-1, self.frames_per_clip, e.img_size,
                                   e.img_size, 3)
        clips = (clips.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        params, fwd = self._egovlp_tower()
        batch = 8
        feats = []
        for i in range(0, len(clips), batch):
            chunk = clips[i : i + batch]
            if len(chunk) < batch:  # static shapes for jit
                pad = np.zeros((batch - len(chunk),) + chunk.shape[1:],
                               np.float32)
                out = np.asarray(
                    fwd(params, jnp.asarray(np.concatenate([chunk, pad]))))
                feats.append(out[: len(chunk)])
            else:
                feats.append(np.asarray(fwd(params, jnp.asarray(chunk))))
        return np.concatenate(feats).astype(np.float32)

    def video_features(self, video_path: str) -> np.ndarray:
        cache = self._video_cache_path(video_path)
        if os.path.exists(cache):
            return np.load(cache)
        if self.backend == "egovlp":
            out = self._egovlp_video_features(video_path)
            np.save(cache, out)
            return out
        from cone_tpu.extract.video import decode_frames

        import torch

        if self._vision_backend is None:
            from transformers import (CLIPImageProcessor,
                                      CLIPVisionModelWithProjection)

            processor = self._clip_models.get(
                "processor") or CLIPImageProcessor.from_pretrained(
                self.clip_model_name)
            vision = (self._clip_models.get("vision")
                      or CLIPVisionModelWithProjection.from_pretrained(
                          self.clip_model_name)).eval()
            encode = None
            if self.clip_engine == "flax":
                from cone_tpu.extract.video import clip_vision_flax_encoder

                encode = clip_vision_flax_encoder(vision, batch_size=64)
            self._vision_backend = (processor, vision, encode)
        processor, vision, encode = self._vision_backend

        frames = decode_frames(video_path, self.fps)
        feats = []
        with torch.no_grad():
            for i in range(0, len(frames), 64):
                batch = list(frames[i : i + 64])
                if encode is not None:
                    pix = processor(images=batch,
                                    return_tensors="np")["pixel_values"]
                    feats.append(encode(pix))
                else:
                    inputs = processor(images=batch, return_tensors="pt")
                    feats.append(vision(**inputs).image_embeds.numpy())
        out = np.concatenate(feats).astype(np.float32)
        np.save(cache, out)
        return out

    def text_features(self, query: str):
        if self.backend == "egovlp":
            return self._egovlp_text_features(query)
        import torch

        if self._text_backend is None:
            from transformers import (CLIPTextModelWithProjection,
                                      CLIPTokenizerFast)

            tokenizer = self._clip_models.get(
                "tokenizer") or CLIPTokenizerFast.from_pretrained(
                self.clip_model_name)
            model = (self._clip_models.get("text")
                     or CLIPTextModelWithProjection.from_pretrained(
                         self.clip_model_name)).eval()
            encode = None
            if self.clip_engine == "flax":
                from cone_tpu.extract.text import clip_text_flax_encoder

                encode = clip_text_flax_encoder(model, tokenizer,
                                                batch_size=1)
            self._text_backend = (tokenizer, model, encode)
        tokenizer, model, encode = self._text_backend
        if encode is not None:
            toks, cls = encode([query])
            return toks[0], cls[0]
        with torch.no_grad():
            enc = tokenizer([query], truncation=True, return_tensors="pt")
            out = model(**enc)
        # last_hidden_state is already final_layer_norm'd — the reference's
        # single ln_final (feature_extraction/clip/model.py:346)
        n = int(enc["attention_mask"].sum())
        tokens = out.last_hidden_state[0, 1 : n - 1].numpy()
        cls = out.text_embeds[0].numpy()
        return tokens, cls

    def _egovlp_text_features(self, query: str):
        """DistilBERT token features (CLS/SEP stripped) + the checkpoint's
        txt_proj applied to the CLS hidden state — the reference demo's
        encode_text (egovlp_extrator.py:139-150)."""
        import torch
        from transformers import AutoModel, AutoTokenizer

        if self._text_backend is None:
            tokenizer = AutoTokenizer.from_pretrained(self.text_model_name)
            model = AutoModel.from_pretrained(self.text_model_name).eval()
            state = torch.load(self.egovlp_checkpoint, map_location="cpu",
                               weights_only=False)
            sd = state.get("state_dict", state)
            proj_w = next(v for k, v in sd.items()
                          if "txt_proj" in k and k.endswith("weight"))
            proj_b = next(v for k, v in sd.items()
                          if "txt_proj" in k and k.endswith("bias"))
            self._text_backend = (tokenizer, model, proj_w, proj_b)
        tokenizer, model, proj_w, proj_b = self._text_backend
        with torch.no_grad():
            enc = tokenizer([query], truncation=True, return_tensors="pt")
            hidden = model(**enc).last_hidden_state
        n = int(enc["attention_mask"].sum())
        tokens = hidden[0, 1 : n - 1].numpy()
        cls = (hidden[0, 0] @ proj_w.T + proj_b).numpy()
        return tokens, cls

    # ---- end to end -----------------------------------------------------

    def localize_moment(self, video_path: str, query: str,
                        top_k: Optional[int] = None) -> List[List[float]]:
        """[[st_sec, ed_sec, prop, match, fusion], ...] ranked by fusion
        (run_on_video/run.py:52-70)."""
        video = l2_normalize(self.video_features(video_path))
        tokens, cls = self.text_features(query)
        # fail fast with a readable message on backbone/model dim mismatch
        # (same probe as serve/server.py MomentService): tokens feed the
        # transformer (t_feat_dim), cls + video feed the matching branch
        # (v_appear_feat_dim)
        td, cd, vd = (np.asarray(tokens).shape[-1], np.asarray(cls).shape[-1],
                      video.shape[-1])
        m = self.cfg.model
        assert (td == m.t_feat_dim and cd == m.v_appear_feat_dim
                and vd == m.v_appear_feat_dim
                and vd == m.v_motion_feat_dim), (
            f"backend '{self.backend}' produces {td}-d tokens / {cd}-d cls /"
            f" {vd}-d video but the model expects t_feat_dim={m.t_feat_dim} /"
            f" v_appear_feat_dim={m.v_appear_feat_dim} /"
            f" v_motion_feat_dim={m.v_motion_feat_dim} (the demo serves one"
            " stream to both branches) — pick the backend matching the"
            " features the checkpoint trained on")
        tokens = l2_normalize(tokens)
        cls = l2_normalize(cls[None])[0]
        return self.localizer.localize(video, tokens, cls, query=query,
                                       top_k=top_k)
