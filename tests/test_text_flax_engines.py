"""RoBERTa / EgoVLP(DistilBERT) text extraction: torch vs flax engines.

The reference extracts RoBERTa tokens (ego4d_roberta_token_extractor.py)
and EgoVLP text (run_on_video/egovlp_extrator.py:139-150) on GPU torch;
cone_tpu's `--engine flax` runs the same towers as jax modules on the
accelerator (extract/text.py _flax_last_hidden_fn, weights converted from
the torch checkpoint). These tests pin the two engines to identical stores
at a tiny random-init config — the same contract test_clip_parity.py
enforces for the CLIP towers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cone_tpu.data.store import PackedArrayStore
from cone_tpu.utils.io import save_jsonl
from tests.clip_testing import FakeClipTokenizer

QUERIES = ["wash the pepper", "open door", "a much longer query about "
           "finding the red toolbox in the garage shelf"]


def _write_queries(tmp_path):
    jsonl = tmp_path / "queries.jsonl"
    save_jsonl([dict(query_id=f"q{i}", query=q)
                for i, q in enumerate(QUERIES)], str(jsonl))
    return str(jsonl)


def _assert_stores_match(a_dir, b_dir, atol=1e-4):
    for store in ("tokens.cfs", "cls.cfs"):
        a = PackedArrayStore(str(a_dir / store))
        b = PackedArrayStore(str(b_dir / store))
        assert set(a.keys()) == set(b.keys()) == {"q0", "q1", "q2"}
        for k in a.keys():
            assert b.get(k).shape == a.get(k).shape
            np.testing.assert_allclose(b.get(k), a.get(k), atol=atol)


def test_roberta_engines_match(tmp_path):
    from cone_tpu.extract.text import extract_roberta_text

    cfg = transformers.RobertaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=24, pad_token_id=0,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.RobertaModel(cfg).eval()
    tok = FakeClipTokenizer()
    jsonl = _write_queries(tmp_path)

    extract_roberta_text(jsonl, str(tmp_path / "torch"), engine="torch",
                         batch_size=2, _model=model, _tokenizer=tok)
    extract_roberta_text(jsonl, str(tmp_path / "flax"), engine="flax",
                         batch_size=2, _model=model, _tokenizer=tok)
    _assert_stores_match(tmp_path / "torch", tmp_path / "flax")


def test_egovlp_text_engines_match(tmp_path):
    from cone_tpu.extract.text import extract_egovlp_text

    cfg = transformers.DistilBertConfig(
        vocab_size=99, dim=32, hidden_dim=64, n_layers=2, n_heads=2,
        max_position_embeddings=24, pad_token_id=0,
        attn_implementation="eager")
    torch.manual_seed(1)
    model = transformers.DistilBertModel(cfg).eval()
    tok = FakeClipTokenizer()
    jsonl = _write_queries(tmp_path)

    torch.manual_seed(2)
    ckpt = tmp_path / "egovlp.pth"
    torch.save({"state_dict": {"txt_proj.weight": torch.randn(16, 32),
                               "txt_proj.bias": torch.randn(16)}}, str(ckpt))

    extract_egovlp_text(jsonl, str(tmp_path / "torch"), str(ckpt),
                        engine="torch", batch_size=2,
                        _model=model, _tokenizer=tok)
    extract_egovlp_text(jsonl, str(tmp_path / "flax"), str(ckpt),
                        engine="flax", batch_size=2,
                        _model=model, _tokenizer=tok)
    _assert_stores_match(tmp_path / "torch", tmp_path / "flax")
