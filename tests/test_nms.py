"""NMS: host path vs a literal transcription of the reference algorithm
(utils/temporal_nms.py:25-74), and device path vs host path."""

import jax.numpy as jnp
import numpy as np
import pytest

from cone_tpu.ops import temporal_nms_device, temporal_nms_host


def ref_nms(predictions, nms_thd, max_after_nms=100):
    """Direct transcription of the reference greedy list algorithm."""

    def iou(pred, gt):
        inter = max(0, min(pred[1], gt[1]) - max(pred[0], gt[0]))
        union = max(pred[1], gt[1]) - min(pred[0], gt[0])
        return 0 if union == 0 else inter / union

    if len(predictions) == 1:
        return predictions
    preds = sorted(predictions, key=lambda x: x[2], reverse=True)
    tstart = [e[0] for e in preds]
    tend = [e[1] for e in preds]
    tscore = [e[2] for e in preds]
    rstart, rend, rscore = [], [], []
    while len(tstart) > 1 and len(rscore) < max_after_nms:
        idx = 1
        while idx < len(tstart):
            if iou([tstart[0], tend[0]], [tstart[idx], tend[idx]]) > nms_thd:
                tstart.pop(idx), tend.pop(idx), tscore.pop(idx)
            else:
                idx += 1
        rstart.append(tstart.pop(0))
        rend.append(tend.pop(0))
        rscore.append(tscore.pop(0))
    if len(rscore) < max_after_nms and len(tstart) >= 1:
        rstart.append(tstart.pop(0))
        rend.append(tend.pop(0))
        rscore.append(tscore.pop(0))
    return [[st, ed, s] for s, st, ed in zip(rscore, rstart, rend)]


def _random_preds(rng, n):
    st = rng.uniform(0, 100, n)
    dur = rng.uniform(1, 30, n)
    score = rng.uniform(0, 2, n)
    return [[float(s), float(s + d), float(sc)] for s, d, sc in zip(st, dur, score)]


@pytest.mark.parametrize("n", [1, 2, 5, 40, 200])
@pytest.mark.parametrize("k", [5, 100])
def test_host_nms_matches_reference(rng, n, k):
    preds = _random_preds(rng, n)
    ref = ref_nms([list(p) for p in preds], 0.5, k)
    got = temporal_nms_host(preds, 0.5, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9)


@pytest.mark.parametrize("n", [2, 17, 64])
def test_device_nms_matches_host(rng, n):
    k = 5
    preds = _random_preds(rng, n)
    ref = temporal_nms_host(preds, 0.5, k)

    arr = np.asarray(preds, np.float32)
    spans = jnp.asarray(arr[None, :, :2])
    scores = jnp.asarray(arr[None, :, 2])
    valid = jnp.ones((1, n), bool)
    o_spans, o_scores, o_valid = temporal_nms_device(spans, scores, valid, 0.5, k)
    o_spans, o_scores, o_valid = map(np.asarray, (o_spans, o_scores, o_valid))

    nkept = int(o_valid[0].sum())
    assert nkept == len(ref)
    np.testing.assert_allclose(o_spans[0, :nkept], np.asarray(ref)[:, :2], rtol=1e-5)
    np.testing.assert_allclose(o_scores[0, :nkept], np.asarray(ref)[:, 2], rtol=1e-5)


def test_device_nms_batched_and_padded(rng):
    # two queries, second has fewer valid candidates
    n, k = 16, 4
    preds_a = np.asarray(_random_preds(rng, n), np.float32)
    preds_b = np.asarray(_random_preds(rng, n), np.float32)
    valid = np.ones((2, n), bool)
    valid[1, 10:] = False

    spans = jnp.asarray(np.stack([preds_a[:, :2], preds_b[:, :2]]))
    scores = jnp.asarray(np.stack([preds_a[:, 2], preds_b[:, 2]]))
    o_spans, o_scores, o_valid = temporal_nms_device(spans, scores, jnp.asarray(valid), 0.5, k)

    ref_b = temporal_nms_host([list(map(float, r)) for r in preds_b[:10]], 0.5, k)
    nkept = int(np.asarray(o_valid)[1].sum())
    assert nkept == len(ref_b)
    np.testing.assert_allclose(np.asarray(o_spans)[1, :nkept], np.asarray(ref_b)[:, :2], rtol=1e-5)


def test_device_nms_disabled_keeps_sorted(rng):
    n, k = 8, 8
    arr = np.asarray(_random_preds(rng, n), np.float32)
    o_spans, o_scores, o_valid = temporal_nms_device(
        jnp.asarray(arr[None, :, :2]), jnp.asarray(arr[None, :, 2]),
        jnp.ones((1, n), bool), -1.0, k,
    )
    order = np.argsort(-arr[:, 2], kind="stable")
    np.testing.assert_allclose(np.asarray(o_spans)[0], arr[order, :2], rtol=1e-6)
    assert np.asarray(o_valid).all()
