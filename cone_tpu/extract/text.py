"""Offline text feature extraction -> packed .cfs stores.

Tokenization stays host-side; the CLIP text tower runs either on host
torch (`engine="torch"`) or TPU-native through the flax ClipTextTower
(`engine="flax"`, models/clip.py). RoBERTa/DistilBERT token extraction
remains host torch (SURVEY.md §2.4). Produces the two stores the data
layer consumes
(`tokens.cfs` + `cls.cfs`), with the reference's exact feature semantics:

  * CLIP  (feature_extraction/mad_clip_text_extractor.py,
           ego4d_clip_token_extractor.py): token features = final-layernorm
    hidden states with SOT/EOT stripped; cls = EOT embedding through the
    text projection.
  * RoBERTa (feature_extraction/ego4d_roberta_token_extractor.py): token
    features = last_hidden_state with special tokens stripped; cls = mean
    of those token features (the reference pairs RoBERTa tokens with the
    EgoVLP cls feature at train time; the mean is the standalone fallback).
  * EgoVLP text tower (run_on_video/egovlp_extrator.py:139-150):
    DistilBERT token states (CLS/SEP stripped) + projected CLS.

Requires model weights on disk / in the HF cache; import is lazy so the
rest of the framework never needs torch.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from cone_tpu.data.store import write_packed_store
from cone_tpu.utils.io import load_jsonl


def _write_stores(out_dir: str, tokens: Dict[str, np.ndarray],
                  cls: Dict[str, np.ndarray]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    write_packed_store(os.path.join(out_dir, "tokens.cfs"), tokens)
    write_packed_store(
        os.path.join(out_dir, "cls.cfs"),
        {k: v[None] if v.ndim == 1 else v for k, v in cls.items()},
    )


def _queries(jsonl_path: str) -> List[Tuple[str, str]]:
    return [(r["query_id"], r["query"]) for r in load_jsonl(jsonl_path)]


def extract_clip_text(jsonl_path: str, out_dir: str,
                      model_name: str = "openai/clip-vit-base-patch32",
                      batch_size: int = 60, device: str = "cpu",
                      engine: str = "torch",
                      _model=None, _tokenizer=None) -> None:
    """CLIP text features. `engine="torch"` runs the HF model on `device`
    (host); `engine="flax"` runs the parity-tested flax tower
    (models/clip.py) on the default jax device — the TPU when available.
    `_model`/`_tokenizer` inject preloaded instances (tests)."""
    import torch
    from transformers import CLIPTextModelWithProjection, CLIPTokenizerFast

    tokenizer = _tokenizer or CLIPTokenizerFast.from_pretrained(model_name)
    model = (_model or
             CLIPTextModelWithProjection.from_pretrained(model_name)).eval()

    rows = _queries(jsonl_path)
    if engine == "flax":
        tokens, cls = _clip_text_flax(model, tokenizer, rows, batch_size)
        _write_stores(out_dir, tokens, cls)
        return

    model = model.to(device)
    tokens, cls = {}, {}
    with torch.no_grad():
        for i in range(0, len(rows), batch_size):
            chunk = rows[i : i + batch_size]
            enc = tokenizer([q for _, q in chunk], padding=True,
                            truncation=True, return_tensors="pt").to(device)
            out = model(**enc)
            # token features = last_hidden_state, which HF returns AFTER
            # final_layer_norm — exactly the reference's single ln_final
            # (feature_extraction/clip/model.py:346)
            hidden = out.last_hidden_state
            lengths = enc["attention_mask"].sum(1).tolist()
            for j, (qid, _) in enumerate(chunk):
                # strip SOT + EOT like the reference (clip_extractor.py:53)
                tokens[qid] = hidden[j, 1 : lengths[j] - 1].cpu().numpy()
                cls[qid] = out.text_embeds[j].cpu().numpy()
    _write_stores(out_dir, tokens, cls)


def clip_text_flax_encoder(model, tokenizer, batch_size: int):
    """texts -> (token feature list (stripped SOT/EOT), (N, D) cls) through
    the jitted flax tower at fixed (batch, context_length) shapes — one
    compiled program regardless of corpus size. Shared by offline
    extraction and the serving predictor."""
    import jax
    import jax.numpy as jnp

    from cone_tpu.models.clip import (ClipTextTower,
                                      clip_text_state_dict_to_params,
                                      text_config_from_hf)

    cfg = text_config_from_hf(model.config)
    params = clip_text_state_dict_to_params(model.state_dict(),
                                            cfg.num_layers)
    tower = ClipTextTower(cfg)
    # the reference tokenizes at a fixed context length (clip_extractor.py:47)
    # and its vendored CLIP masks causally only — padding cannot leak left
    apply = jax.jit(lambda ids, eot: tower.apply({"params": params}, ids, eot))

    def encode(texts):
        out_tokens, out_cls = [], []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i : i + batch_size]
            enc = tokenizer(chunk, padding="max_length",
                            max_length=cfg.context_length, truncation=True,
                            return_tensors="np")
            ids = enc["input_ids"].astype(np.int32)
            lengths = enc["attention_mask"].sum(1).astype(np.int32)
            if len(chunk) < batch_size:  # static batch: pad w/ repeated rows
                reps = batch_size - len(chunk)
                ids = np.concatenate([ids, np.repeat(ids[-1:], reps, 0)])
                lengths = np.concatenate(
                    [lengths, np.repeat(lengths[-1:], reps)])
            toks, emb = apply(jnp.asarray(ids), jnp.asarray(lengths - 1))
            toks = np.asarray(toks, np.float32)
            emb = np.asarray(emb, np.float32)
            for j in range(len(chunk)):
                out_tokens.append(toks[j, 1 : lengths[j] - 1].copy())
                out_cls.append(emb[j])
        return out_tokens, np.stack(out_cls)

    return encode


def _clip_text_flax(model, tokenizer, rows, batch_size):
    encode = clip_text_flax_encoder(model, tokenizer, batch_size)
    toks, cls = encode([q for _, q in rows])
    return ({qid: t for (qid, _), t in zip(rows, toks)},
            {qid: c for (qid, _), c in zip(rows, cls)})


def extract_roberta_text(jsonl_path: str, out_dir: str,
                         model_name: str = "roberta-base",
                         batch_size: int = 32, device: str = "cpu") -> None:
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name).to(device).eval()

    rows = _queries(jsonl_path)
    tokens, cls = {}, {}
    with torch.no_grad():
        for i in range(0, len(rows), batch_size):
            chunk = rows[i : i + batch_size]
            enc = tokenizer([q for _, q in chunk], padding=True,
                            truncation=True, return_tensors="pt").to(device)
            hidden = model(**enc).last_hidden_state
            lengths = enc["attention_mask"].sum(1).tolist()
            for j, (qid, _) in enumerate(chunk):
                # strip <s> and </s> (ego4d_roberta_token_extractor.py:107-120)
                tok = hidden[j, 1 : lengths[j] - 1].cpu().numpy()
                tokens[qid] = tok
                cls[qid] = tok.mean(0)
    _write_stores(out_dir, tokens, cls)


def extract_egovlp_text(jsonl_path: str, out_dir: str, checkpoint: str,
                        model_name: str = "distilbert-base-uncased",
                        batch_size: int = 32, device: str = "cpu") -> None:
    """EgoVLP text tower: DistilBERT + linear projection from the EgoVLP
    checkpoint ('txt_proj' weights in the released model)."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name).to(device).eval()

    state = torch.load(checkpoint, map_location="cpu")
    sd = state.get("state_dict", state)
    proj_w = next(v for k, v in sd.items() if "txt_proj" in k and k.endswith("weight"))
    proj_b = next(v for k, v in sd.items() if "txt_proj" in k and k.endswith("bias"))

    rows = _queries(jsonl_path)
    tokens, cls = {}, {}
    with torch.no_grad():
        for i in range(0, len(rows), batch_size):
            chunk = rows[i : i + batch_size]
            enc = tokenizer([q for _, q in chunk], padding=True,
                            truncation=True, return_tensors="pt").to(device)
            hidden = model(**enc).last_hidden_state
            lengths = enc["attention_mask"].sum(1).tolist()
            for j, (qid, _) in enumerate(chunk):
                tokens[qid] = hidden[j, 1 : lengths[j] - 1].cpu().numpy()
                cls_vec = hidden[j, 0] @ proj_w.T + proj_b
                cls[qid] = cls_vec.cpu().numpy()
    _write_stores(out_dir, tokens, cls)
