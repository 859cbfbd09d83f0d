"""eval.corpus_dtype: quantized HBM-resident feature corpus.

The serving capacity of one chip is set by how many movies' features fit in
HBM (a 2 h MAD movie is ~134 MB fp32). `eval.corpus_dtype` stores the
corpus as bf16 (2x) or int8 with per-frame symmetric scales (4x) and
decodes to fp32 inside the compiled program, so compute is unchanged —
only the resident bytes shrink. These tests pin (a) the fp32 path is
bit-identical to before (scale is an exact *1.0), (b) the encode/decode
round-trip error bound, (c) end-to-end ranking quality survives
quantization on a planted-signal corpus, for the staged and fused paths.
"""

import dataclasses

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.eval.metrics import evaluate_window_ranklists
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32, adapter_module="none",
        ),
        data=DataConfig(
            max_v_l=32, max_q_l=8, clip_length=1.0, topk_window=5,
            max_ctx_l=256, max_windows=5,
        ),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=4,
                        video_batch=2),
    )


@pytest.fixture(scope="module")
def ds(cfg):
    return make_synthetic_dataset(
        cfg.data, n_videos=3, queries_per_video=3, ctx_l_range=(100, 220),
        dim=DIM, signal=3.0, seed=5,
    )


def with_dtype(cfg, dt):
    return cfg.replace(eval=dataclasses.replace(cfg.eval, corpus_dtype=dt))


def test_int8_roundtrip_error_bound(cfg, ds):
    """Symmetric per-frame int8: |x - dec(enc(x))| <= scale/2 per element,
    and zero (padding) rows decode to exact zeros."""
    pipe = InferencePipeline(*build_model_and_params(cfg.model, seed=0),
                             ds, with_dtype(cfg, "int8"))
    clip_id = ds.examples[0].clip_id
    appear_np, _, ctx_l = pipe._padded_video(clip_id)
    q, scale = pipe._encode_corpus(appear_np)
    q, scale = np.asarray(q), np.asarray(scale)
    assert q.dtype == np.int8 and scale.shape == (len(appear_np), 1)
    dec = q.astype(np.float32) * scale
    assert np.all(np.abs(dec - appear_np) <= scale / 2 + 1e-7)
    assert np.all(dec[ctx_l:] == 0.0)


def test_float32_corpus_is_bit_exact(cfg, ds):
    """Default corpus_dtype=float32 must be unchanged by the decode wrapper
    (multiply by the exact scalar 1.0): identical submissions + ranklists."""
    model, params = build_model_and_params(cfg.model, seed=0)
    a = InferencePipeline(model, params, ds, cfg)
    subs, rank = a.run(host_postproc=True)
    assert np.asarray(a._device_video(ds.examples[0].clip_id)[0]).dtype == np.float32
    # second pipeline built through the same (current) code path — this test
    # exists to catch a future regression where fp32 stops being exact
    b = InferencePipeline(model, params, ds, with_dtype(cfg, "float32"))
    subs2, rank2 = b.run(host_postproc=True)
    assert rank == rank2 and subs == subs2


@pytest.mark.parametrize("dt,tol", [("bfloat16", 0.05), ("int8", 0.1)])
def test_quantized_corpus_preserves_ranking(cfg, ds, dt, tol):
    """With a strong planted signal, coarse recall survives quantization
    (R@5 window recall stays 1.0), and — on the fp32 path's own ranklists,
    so both pipelines score identical windows — the fine stage's continuous
    outputs (spans, fg prob, matching score) stay within a small tolerance.
    (Post-NMS top-1 is NOT compared: with an untrained model fusion scores
    tie almost exactly and any epsilon flips the argmax.)"""
    model, params = build_model_and_params(cfg.model, seed=0)
    ref = InferencePipeline(model, params, ds, cfg)
    qnt = InferencePipeline(model, params, ds, with_dtype(cfg, dt))
    enc = qnt._device_video(ds.examples[0].clip_id)[0]
    assert np.asarray(enc).dtype == ({"bfloat16": "bfloat16", "int8": np.int8}[dt])

    gt = [dict(query_id=e.query_id, timestamps=e.timestamps)
          for e in ds.examples]
    recall = evaluate_window_ranklists(
        qnt.coarse(), gt, [1, 5], cfg.data.clip_length, cfg.data.max_v_l)
    assert recall[1] == 1.0

    rank = ref.coarse()
    rows_f = {r["example"].query_id: r for r in ref.fine(rank)}
    for rq in qnt.fine(rank):
        rf = rows_f[rq["example"].query_id]
        np.testing.assert_allclose(rq["prob"], rf["prob"], atol=tol)
        np.testing.assert_allclose(rq["match"], rf["match"], atol=tol)
        np.testing.assert_allclose(rq["spans_sec"], rf["spans_sec"],
                                   atol=tol * cfg.data.max_v_l)


def test_fused_matches_staged_under_int8(cfg, ds):
    """The fused single-dispatch path and the staged path must agree with
    each other under quantization (same encoded corpus, same decode)."""
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, with_dtype(cfg, "int8"))
    subs_f, rank_f = pipe.run(host_postproc=False, fused=True)
    rank_s = pipe.coarse()
    assert rank_f == rank_s
    staged = {r["query_id"]: r
              for r in pipe.postprocess_device(pipe.fine(rank_s))}
    for row in subs_f["fusion"]:
        got = np.asarray(row["predicted_times"])
        want = np.asarray(staged[row["query_id"]]["predicted_times"])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_int8_resident_bytes_shrink(cfg, ds):
    """The actual HBM-resident corpus arrays are ~4x smaller under int8."""
    model, params = build_model_and_params(cfg.model, seed=0)
    f32 = InferencePipeline(model, params, ds, cfg)
    i8 = InferencePipeline(model, params, ds, with_dtype(cfg, "int8"))

    def resident(pipe):
        total = 0
        for e in {x.clip_id for x in ds.examples}:
            appear, a_scale, motion, m_scale, _ = pipe._device_video(e)
            seen = {id(appear): appear.nbytes + np.asarray(a_scale).nbytes}
            seen[id(motion)] = motion.nbytes + np.asarray(m_scale).nbytes
            total += sum(seen.values())
        return total

    r_f32, r_i8 = resident(f32), resident(i8)
    assert r_i8 < r_f32 / 3  # 4x minus the per-frame scale overhead
