"""Flax CLIP towers (models/clip.py) vs HuggingFace torch CLIP.

The reference extracts MAD features with the vendored OpenAI CLIP
(feature_extraction/clip/model.py); HF's CLIP*WithProjection is the same
architecture in the released-weight layout, so parity against HF torch at a
tiny random-init config pins the flax towers to the reference semantics
(extract/text.py already consumes the HF layout on the torch path).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from cone_tpu.models.clip import (
    ClipTextTower, ClipVisionTower, clip_text_state_dict_to_params,
    clip_vision_state_dict_to_params, text_config_from_hf,
    vision_config_from_hf)


@pytest.fixture(scope="module")
def hf_vision():
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=16, patch_size=8,
        projection_dim=24, hidden_act="quick_gelu",
        attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def hf_text():
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=12, projection_dim=24,
        hidden_act="quick_gelu", eos_token_id=98,
        attn_implementation="eager")
    torch.manual_seed(1)
    model = transformers.CLIPTextModelWithProjection(cfg).eval()
    return cfg, model


def test_vision_tower_parity(hf_vision):
    cfg, model = hf_vision
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 3, 16, 16)).astype(np.float32)  # NCHW

    with torch.no_grad():
        want = model(pixel_values=torch.from_numpy(pixels)).image_embeds.numpy()

    tower = ClipVisionTower(vision_config_from_hf(cfg))
    params = clip_vision_state_dict_to_params(model.state_dict(),
                                              cfg.num_hidden_layers)
    got = tower.apply({"params": params},
                      jnp.asarray(pixels.transpose(0, 2, 3, 1)))  # NHWC
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_text_tower_parity(hf_text):
    cfg, model = hf_text
    rng = np.random.default_rng(1)
    bos, eos, pad = 97, 98, 0
    # ragged lengths, padded to the fixed context length like the
    # reference's tokenize(context_length=77) (clip_extractor.py:47)
    lengths = [5, 12, 3]
    ids = np.full((3, 12), pad, np.int64)
    for i, n in enumerate(lengths):
        ids[i, 0] = bos
        ids[i, 1:n - 1] = rng.integers(1, 97, n - 2)
        ids[i, n - 1] = eos
    attn = (np.arange(12)[None] < np.asarray(lengths)[:, None]).astype(np.int64)

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(attn))
    want_tokens = out.last_hidden_state.numpy()   # final_layer_norm, ONCE
    want_cls = out.text_embeds.numpy()

    tower = ClipTextTower(text_config_from_hf(cfg))
    params = clip_text_state_dict_to_params(model.state_dict(),
                                            cfg.num_hidden_layers)
    eot = np.asarray(lengths) - 1
    got_tokens, got_cls = tower.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(eot),
        jnp.asarray(attn, bool))
    np.testing.assert_allclose(np.asarray(got_cls), want_cls, atol=2e-5)
    # padded positions are garbage on both sides; compare valid tokens
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(got_tokens)[i, :n],
                                   want_tokens[i, :n], atol=2e-5)


def test_text_tower_padding_invariance(hf_text):
    """Causal attention means padding never leaks into real positions —
    the fixed-context batch must reproduce the per-example forward."""
    cfg, model = hf_text
    tower = ClipTextTower(text_config_from_hf(cfg))
    params = clip_text_state_dict_to_params(model.state_dict(),
                                            cfg.num_hidden_layers)
    ids = np.array([[97, 5, 6, 98, 0, 0, 0, 0, 0, 0, 0, 0]], np.int32)
    valid = ids != 0
    toks_padded, cls_padded = tower.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray([3]),
        jnp.asarray(valid))
    toks_exact, cls_exact = tower.apply(
        {"params": params}, jnp.asarray(ids[:, :4]), jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(toks_padded)[:, :4],
                               np.asarray(toks_exact), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls_padded),
                               np.asarray(cls_exact), atol=1e-5)


def test_extract_text_engines_match(hf_text, tmp_path):
    """extract_clip_text torch vs flax engines write identical stores."""
    from cone_tpu.data.store import PackedArrayStore
    from cone_tpu.extract.text import extract_clip_text
    from cone_tpu.utils.io import save_jsonl

    _, model = hf_text
    jsonl = tmp_path / "queries.jsonl"
    save_jsonl(
        [dict(query_id=f"q{i}", query=q) for i, q in
         enumerate(["wash the pepper", "open door", "a much longer query "
                    "about finding the red toolbox in the garage shelf"])],
        str(jsonl))
    from tests.clip_testing import FakeClipTokenizer

    tok = FakeClipTokenizer()
    extract_clip_text(str(jsonl), str(tmp_path / "torch"), engine="torch",
                      batch_size=2, _model=model, _tokenizer=tok)
    extract_clip_text(str(jsonl), str(tmp_path / "flax"), engine="flax",
                      batch_size=2, _model=model, _tokenizer=tok)
    for store in ("tokens.cfs", "cls.cfs"):
        a = PackedArrayStore(str(tmp_path / "torch" / store))
        b = PackedArrayStore(str(tmp_path / "flax" / store))
        assert set(a.keys()) == set(b.keys()) == {"q0", "q1", "q2"}
        for k in a.keys():
            np.testing.assert_allclose(b.get(k), a.get(k), atol=3e-5)


def test_extract_video_engines_match(hf_vision, tmp_path, monkeypatch):
    """extract_clip_video torch vs flax engines write identical stores."""
    import cone_tpu.extract.video as xv
    from cone_tpu.data.store import PackedArrayStore

    _, model = hf_vision
    rng = np.random.default_rng(2)
    frames = {"vidA": rng.integers(0, 255, (5, 16, 16, 3), np.uint8),
              "vidB": rng.integers(0, 255, (3, 16, 16, 3), np.uint8)}
    monkeypatch.setattr(xv, "decode_frames",
                        lambda path, fps, size=224: frames[path])
    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 16}, crop_size={"height": 16, "width": 16})
    videos = {"vidA": "vidA", "vidB": "vidB"}
    xv.extract_clip_video(videos, str(tmp_path / "t.cfs"), engine="torch",
                          batch_size=4, _model=model, _processor=proc)
    xv.extract_clip_video(videos, str(tmp_path / "f.cfs"), engine="flax",
                          batch_size=4, _model=model, _processor=proc)
    a = PackedArrayStore(str(tmp_path / "t.cfs"))
    b = PackedArrayStore(str(tmp_path / "f.cfs"))
    for k in ("vidA", "vidB"):
        assert b.get(k).shape == a.get(k).shape == (frames[k].shape[0], 24)
        np.testing.assert_allclose(b.get(k), a.get(k), atol=3e-5)
