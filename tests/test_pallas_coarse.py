"""Pallas coarse kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import cone_tpu.ops.pallas_coarse as pc
from cone_tpu.ops.windows import num_windows, window_scores_from_frame_scores


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # CPU has no Mosaic backend — run the kernel in interpreter mode.
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    pc.coarse_segment_max.__wrapped__  # keep jit cache from poisoning
    yield


@pytest.mark.parametrize("ctx_l,stride", [(333, 45), (900, 45), (496, 62)])
def test_segment_max_matches_jnp(rng, ctx_l, stride):
    d, q = 64, 8
    n_seg = -(-ctx_l // stride) + 3
    l_pad = n_seg * stride
    feats = np.zeros((l_pad, d), np.float32)
    feats[:ctx_l] = rng.normal(size=(ctx_l, d))
    cls = rng.normal(size=(q, d)).astype(np.float32)

    seg = np.asarray(
        pc.coarse_segment_max.__wrapped__(
            jnp.asarray(feats), jnp.asarray(cls), jnp.asarray(ctx_l), stride
        )
    )
    ref_scores = cls @ feats[:ctx_l].T  # (Q, ctx_l)
    for s in range(n_seg):
        lo, hi = s * stride, min((s + 1) * stride, ctx_l)
        if lo >= ctx_l:
            assert (seg[:, s] <= pc.NEG_INF / 2).all()
        else:
            np.testing.assert_allclose(
                seg[:, s], ref_scores[:, lo:hi].max(1), rtol=1e-5
            )


def test_window_scores_match_reference_path(rng):
    ctx_l, stride, max_v_l = 700, 45, 90
    d, q = 32, 8
    l_pad = (-(-ctx_l // stride) + 2) * stride
    feats = np.zeros((l_pad, d), np.float32)
    feats[:ctx_l] = rng.normal(size=(ctx_l, d))
    cls = rng.normal(size=(q, d)).astype(np.float32)

    seg = pc.coarse_segment_max.__wrapped__(
        jnp.asarray(feats), jnp.asarray(cls), jnp.asarray(ctx_l), stride
    )
    max_w = num_windows(l_pad, stride)
    got, got_valid = pc.window_scores_from_segment_max(
        seg, jnp.asarray(ctx_l), stride, max_w
    )

    frame_scores = jnp.asarray(cls @ feats.T)  # (Q, L_pad)
    want, want_valid = jax.vmap(
        lambda fs: window_scores_from_frame_scores(fs, jnp.asarray(ctx_l), stride, max_w)
    )(frame_scores)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(want_valid[0]))
    nw = num_windows(ctx_l, stride)
    np.testing.assert_allclose(
        np.asarray(got)[:, :nw], np.asarray(want)[:, :nw], rtol=1e-5
    )


def test_pipeline_coarse_with_pallas_kernel_matches_xla():
    """eval.use_pallas_coarse=True through the real InferencePipeline
    (interpret mode): identical window ranklists to the XLA path."""
    import dataclasses

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.init import build_model_and_params

    dim = 32
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=32,
                          adapter_module="none"),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0,
                        topk_window=5, max_ctx_l=256, max_windows=5),
        eval=EvalConfig(query_chunk=4),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=3,
                                ctx_l_range=(100, 200), dim=dim, seed=3)
    model, params = build_model_and_params(cfg.model, seed=0)
    xla = InferencePipeline(model, params, ds, cfg)
    cfg_p = cfg.replace(eval=dataclasses.replace(cfg.eval,
                                                 use_pallas_coarse=True))
    pal = InferencePipeline(model, params, ds, cfg_p)
    assert pal.coarse() == xla.coarse()
