"""Span geometry vs the reference doctest values (cone/span_utils.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.ops import (
    generalized_temporal_iou,
    span_cxw_to_xx,
    span_xx_to_cxw,
    temporal_intersection_over_pred,
    temporal_iou,
)


def test_xx_to_cxw_doctest():
    spans = jnp.array([[0.0, 1.0], [0.2, 0.4]])
    out = span_xx_to_cxw(spans)
    np.testing.assert_allclose(out, [[0.5, 1.0], [0.3, 0.2]], atol=1e-6)


def test_xx_to_cxw_batched():
    spans = jnp.array([[[0.0, 1.0], [0.2, 0.4]]])
    out = span_xx_to_cxw(spans)
    np.testing.assert_allclose(out, [[[0.5, 1.0], [0.3, 0.2]]], atol=1e-6)


def test_cxw_to_xx_doctest():
    spans = jnp.array([[0.5, 1.0], [0.3, 0.2]])
    out = span_cxw_to_xx(spans)
    np.testing.assert_allclose(out, [[0.0, 1.0], [0.2, 0.4]], atol=1e-6)


def test_roundtrip(rng):
    xx = np.sort(rng.uniform(0, 1, size=(64, 2)), axis=-1)
    back = span_cxw_to_xx(span_xx_to_cxw(jnp.asarray(xx)))
    np.testing.assert_allclose(back, xx, atol=1e-6)


def test_temporal_iou_doctest():
    s1 = jnp.array([[0.0, 0.2], [0.5, 1.0]])
    s2 = jnp.array([[0.0, 0.3], [0.0, 1.0]])
    iou, union = temporal_iou(s1, s2)
    np.testing.assert_allclose(iou, [[0.6667, 0.2], [0.0, 0.5]], atol=1e-4)
    np.testing.assert_allclose(union, [[0.3, 1.0], [0.8, 1.0]], atol=1e-4)


def test_giou_doctest():
    s1 = jnp.array([[0.0, 0.2], [0.5, 1.0]])
    s2 = jnp.array([[0.0, 0.3], [0.0, 1.0]])
    giou = generalized_temporal_iou(s1, s2)
    np.testing.assert_allclose(giou, [[0.6667, 0.2], [-0.2, 0.5]], atol=1e-4)


def test_intersection_over_pred():
    gt = jnp.array([[0.0, 1.0]])
    pred = jnp.array([[0.5, 1.5], [2.0, 3.0]])
    out = temporal_intersection_over_pred(gt, pred)
    np.testing.assert_allclose(out, [[0.5, 0.0]], atol=1e-6)


def test_giou_matches_iou_when_overlapping(rng):
    # When spans overlap and neither contains a gap, gIoU == IoU - penalty>=0
    s1 = jnp.asarray(np.sort(rng.uniform(0, 1, size=(16, 2)), axis=-1))
    giou = generalized_temporal_iou(s1, s1)
    np.testing.assert_allclose(np.diag(np.asarray(giou)), 1.0, atol=1e-5)


def test_round4_device_matches_host_rounding_at_mad_magnitudes():
    """round4_device must reproduce the host path's float(f"{v:.4f}") for
    fp32 timestamps across the MAD time range. The naive fp32
    round(x*1e4)/1e4 cannot: past x ~ 839 s the product's ULP exceeds 1, so
    the .5 boundary is unrepresentable and the rounding DECISION is wrong
    for ~half of all values (not just boundary cases)."""
    import jax.numpy as jnp
    import numpy as np

    from cone_tpu.ops.spans import round4_device

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(0, 120, 2000),        # ego4d-scale timestamps
        rng.uniform(800, 7200, 4000),     # MAD-scale (2 h movies)
    ]).astype(np.float32)
    got = np.asarray(round4_device(jnp.asarray(x)), np.float32)
    want = np.asarray([float(f"{v:.4f}") for v in x], np.float32)
    naive = np.asarray(jnp.round(jnp.asarray(x) * 1e4) / 1e4, np.float32)
    # the naive version is visibly broken at these magnitudes...
    assert (np.abs(naive - want) > 2e-4).mean() > 0.05
    # ...the split version agrees except within fp32 product error of an
    # exact .5 boundary (none in 6000 random draws) and fp32 output ULP
    np.testing.assert_allclose(got, want, atol=5e-4)
    exact = np.abs(got - want) <= np.spacing(want)
    assert exact.mean() > 0.999, exact.mean()
