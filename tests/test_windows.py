"""Window geometry / coarse scoring vs a direct re-implementation of the
reference loop (cone/inference.py:286-299, cone/ego4d_mad_dataloader.py:142-159)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.ops import (
    num_windows,
    slice_windows,
    window_bounds,
    window_scores_from_frame_scores,
)


def ref_window_scores(frame_scores, ctx_l, stride, max_v_l):
    """Literal transcription of the reference's per-window max loop."""
    nw = math.ceil(ctx_l / stride) + 1
    out = []
    for i in range(nw):
        s = max((i - 1) * stride, 0)
        e = min((i - 1) * stride + max_v_l, ctx_l)
        out.append(frame_scores[s:e].max())
    return np.asarray(out)


@pytest.mark.parametrize("ctx_l", [1, 7, 45, 89, 90, 91, 180, 333, 901])
def test_window_scores_match_reference_loop(rng, ctx_l):
    max_v_l = 90
    stride = max_v_l // 2
    l_pad = 1024
    scores = rng.normal(size=l_pad).astype(np.float32)
    ref = ref_window_scores(scores[:ctx_l], ctx_l, stride, max_v_l)

    max_w = num_windows(l_pad, stride)
    got, valid = window_scores_from_frame_scores(
        jnp.asarray(scores), jnp.asarray(ctx_l), stride, max_w
    )
    got, valid = np.asarray(got), np.asarray(valid)
    nw = num_windows(ctx_l, stride)
    assert valid[:nw].all() and not valid[nw:].any()
    np.testing.assert_allclose(got[:nw], ref, rtol=1e-6)


def test_ranklist_matches_reference_sort(rng):
    """Descending sort of window scores == reference torch.sort ranklist."""
    ctx_l, max_v_l = 333, 90
    stride = max_v_l // 2
    scores = rng.normal(size=512).astype(np.float32)
    ref = ref_window_scores(scores[:ctx_l], ctx_l, stride, max_v_l)
    ref_rank = np.argsort(-ref, kind="stable")

    max_w = num_windows(512, stride)
    got, valid = window_scores_from_frame_scores(
        jnp.asarray(scores), jnp.asarray(ctx_l), stride, max_w
    )
    got_rank = np.argsort(-np.asarray(got), kind="stable")[: len(ref)]
    np.testing.assert_array_equal(got_rank, ref_rank)


@pytest.mark.parametrize("ctx_l", [30, 90, 135, 200])
def test_slice_windows(rng, ctx_l):
    max_v_l, d = 90, 16
    stride = max_v_l // 2
    l_pad = 256
    feats = np.zeros((l_pad, d), np.float32)
    feats[:ctx_l] = rng.normal(size=(ctx_l, d))

    nw = num_windows(ctx_l, stride)
    idx = np.arange(nw)
    got, mask, starts, lengths = slice_windows(
        jnp.asarray(feats), jnp.asarray(idx), stride, max_v_l, jnp.asarray(ctx_l)
    )
    got, mask = np.asarray(got), np.asarray(mask)
    for i in range(nw):
        s = max((i - 1) * stride, 0)
        e = min((i - 1) * stride + max_v_l, ctx_l)
        assert starts[i] == s and lengths[i] == e - s
        np.testing.assert_allclose(got[i, : e - s], feats[s:e], rtol=1e-6)
        assert mask[i, : e - s].all() and not mask[i, e - s :].any()
        np.testing.assert_array_equal(got[i, e - s :], 0)


def test_window_bounds_scalar():
    s, e = window_bounds(jnp.asarray(0), 45, 90, jnp.asarray(100))
    assert (int(s), int(e)) == (0, 45)
    s, e = window_bounds(jnp.asarray(2), 45, 90, jnp.asarray(100))
    assert (int(s), int(e)) == (45, 100)
