"""Offline text feature extraction -> packed .cfs stores.

Tokenization stays host-side; every text tower runs either on host torch
(`engine="torch"`) or on the jax default device — the TPU when attached —
(`engine="flax"`): CLIP through the hand-written parity-tested
ClipTextTower (models/clip.py), RoBERTa/DistilBERT through HuggingFace's
flax classes with weights converted from the torch checkpoint (plain jax
modules, jit-compiled at one fixed corpus shape). Produces the two stores
the data layer consumes
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


def _flax_last_hidden_fn(pt_model, flax_cls):
    """torch encoder -> fixed-shape jitted flax forward on the jax default
    device (the TPU when attached). HF's flax classes are plain jax
    modules; the weights convert 1:1 from the torch state dict. Padding
    never leaks into valid positions (additive -inf attention mask), so a
    fixed width reproduces the torch batch-max-width outputs exactly."""
    import jax

    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )

    fx = flax_cls(pt_model.config, seed=0)
    params = convert_pytorch_state_dict_to_flax(pt_model.state_dict(), fx)

    @jax.jit
    def apply(params, ids, mask):
        return fx(input_ids=ids, attention_mask=mask,
                  params=params).last_hidden_state

    return lambda ids, mask: np.asarray(apply(params, ids, mask), np.float32)


def _encode_corpus_flax(rows, tokenizer, hidden_fn, batch_size):
    """Yield (query_id, (L, D) last-hidden row, true length) for every
    query, through fixed (batch_size, corpus_max_len) dispatches — one
    compiled program for the whole corpus (width rounded up to a sublane
    multiple; short final batches pad with repeated rows)."""
    enc = tokenizer([q for _, q in rows], padding=True, truncation=True,
                    return_tensors="np")
    ids_all = enc["input_ids"].astype(np.int32)
    mask_all = enc["attention_mask"].astype(np.int32)
    pad_w = (-ids_all.shape[1]) % 8
    if pad_w:  # pad id is irrelevant: masked positions never attend
        ids_all = np.pad(ids_all, ((0, 0), (0, pad_w)))
        mask_all = np.pad(mask_all, ((0, 0), (0, pad_w)))
    for i in range(0, len(rows), batch_size):
        ids = ids_all[i : i + batch_size]
        mask = mask_all[i : i + batch_size]
        if len(ids) < batch_size:
            reps = batch_size - len(ids)
            ids = np.concatenate([ids, np.repeat(ids[-1:], reps, 0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], reps, 0)])
        hidden = hidden_fn(ids, mask)
        for j, (qid, _) in enumerate(rows[i : i + batch_size]):
            yield qid, hidden[j], int(mask[j].sum())


def extract_roberta_text(jsonl_path: str, out_dir: str,
                         model_name: str = "roberta-base",
                         batch_size: int = 32, device: str = "cpu",
                         engine: str = "torch",
                         _model=None, _tokenizer=None) -> None:
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = _tokenizer or AutoTokenizer.from_pretrained(model_name)
    model = (_model or AutoModel.from_pretrained(model_name)).eval()

    rows = _queries(jsonl_path)
    tokens, cls = {}, {}
    if engine == "flax":
        from transformers import FlaxRobertaModel

        hidden_fn = _flax_last_hidden_fn(model, FlaxRobertaModel)
        for qid, hidden, n in _encode_corpus_flax(rows, tokenizer,
                                                  hidden_fn, batch_size):
            tok = hidden[1 : n - 1]
            tokens[qid] = tok
            cls[qid] = tok.mean(0)
        _write_stores(out_dir, tokens, cls)
        return

    model = model.to(device)
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
                        batch_size: int = 32, device: str = "cpu",
                        engine: str = "torch",
                        _model=None, _tokenizer=None) -> None:
    """EgoVLP text tower: DistilBERT + linear projection from the EgoVLP
    checkpoint ('txt_proj' weights in the released model). engine="flax"
    runs DistilBERT on the jax device; the tiny (768, 256) projection is a
    host matmul either way."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = _tokenizer or AutoTokenizer.from_pretrained(model_name)
    model = (_model or AutoModel.from_pretrained(model_name)).eval()

    state = torch.load(checkpoint, map_location="cpu")
    sd = state.get("state_dict", state)
    proj_w = next(v for k, v in sd.items() if "txt_proj" in k and k.endswith("weight"))
    proj_b = next(v for k, v in sd.items() if "txt_proj" in k and k.endswith("bias"))

    rows = _queries(jsonl_path)
    tokens, cls = {}, {}
    if engine == "flax":
        from transformers import FlaxDistilBertModel

        pw, pb = proj_w.numpy(), proj_b.numpy()
        hidden_fn = _flax_last_hidden_fn(model, FlaxDistilBertModel)
        for qid, hidden, n in _encode_corpus_flax(rows, tokenizer,
                                                  hidden_fn, batch_size):
            tokens[qid] = hidden[1 : n - 1]
            cls[qid] = hidden[0] @ pw.T + pb
        _write_stores(out_dir, tokens, cls)
        return

    model = model.to(device)
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
