"""End-to-end demo predictor: video file + query text -> ranked moments.

Counterpart of run_on_video/run.py CONEPredictor: extract clip features
(cached to disk like the reference's .pt cache, run.py:30-38), extract text
features, localize with the batched pipeline.

Feature extraction runs host-side (torch/ffmpeg; weights must be available
locally — this box has no network). The localization path is pure cone_tpu.
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
                 clip_model_name: str = "openai/clip-vit-base-patch32",
                 fps: Optional[float] = None,
                 cache_dir: str = "feature_cache"):
        self.cfg = cfg
        self.localizer = OnlineLocalizer(model, params, cfg)
        self.clip_model_name = clip_model_name
        self.fps = fps if fps is not None else 1.0 / cfg.data.clip_length
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._text_backend = None

    # ---- feature extraction (host, torch) ------------------------------

    def _video_cache_path(self, video_path: str) -> str:
        key = hashlib.sha1(
            f"{os.path.abspath(video_path)}:{self.clip_model_name}:{self.fps}".encode()
        ).hexdigest()[:16]
        return os.path.join(self.cache_dir, f"vid_{key}.npy")

    def video_features(self, video_path: str) -> np.ndarray:
        cache = self._video_cache_path(video_path)
        if os.path.exists(cache):
            return np.load(cache)
        from cone_tpu.extract.video import decode_frames

        import torch
        from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection

        frames = decode_frames(video_path, self.fps)
        processor = CLIPImageProcessor.from_pretrained(self.clip_model_name)
        vision = CLIPVisionModelWithProjection.from_pretrained(
            self.clip_model_name
        ).eval()
        feats = []
        with torch.no_grad():
            for i in range(0, len(frames), 64):
                inputs = processor(images=list(frames[i : i + 64]),
                                   return_tensors="pt")
                feats.append(vision(**inputs).image_embeds.numpy())
        out = np.concatenate(feats).astype(np.float32)
        np.save(cache, out)
        return out

    def text_features(self, query: str):
        import torch
        from transformers import (CLIPTextModelWithProjection,
                                  CLIPTokenizerFast)

        if self._text_backend is None:
            self._text_backend = (
                CLIPTokenizerFast.from_pretrained(self.clip_model_name),
                CLIPTextModelWithProjection.from_pretrained(
                    self.clip_model_name
                ).eval(),
            )
        tokenizer, model = self._text_backend
        with torch.no_grad():
            enc = tokenizer([query], truncation=True, return_tensors="pt")
            out = model(**enc)
            hidden = model.text_model.final_layer_norm(
                model.text_model(**enc).last_hidden_state
            )
        n = int(enc["attention_mask"].sum())
        tokens = hidden[0, 1 : n - 1].numpy()
        cls = out.text_embeds[0].numpy()
        return tokens, cls

    # ---- end to end -----------------------------------------------------

    def localize_moment(self, video_path: str, query: str,
                        top_k: Optional[int] = None) -> List[List[float]]:
        """[[st_sec, ed_sec, prop, match, fusion], ...] ranked by fusion
        (run_on_video/run.py:52-70)."""
        video = l2_normalize(self.video_features(video_path))
        tokens, cls = self.text_features(query)
        tokens = l2_normalize(tokens)
        cls = l2_normalize(cls[None])[0]
        return self.localizer.localize(video, tokens, cls, query=query,
                                       top_k=top_k)
