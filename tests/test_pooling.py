"""Masked segment mean pooling vs the reference's Python slice loops
(cone/model.py:163-166, :186-200)."""

import jax.numpy as jnp
import numpy as np

from cone_tpu.ops import masked_segment_mean, proposal_mean_pool


def test_masked_segment_mean_matches_slices(rng):
    b, l, d, k = 3, 50, 8, 4
    feats = rng.normal(size=(b, l, d)).astype(np.float32)
    start = rng.integers(0, 40, size=(b, k))
    end = start + rng.integers(1, 10, size=(b, k))

    got = np.asarray(masked_segment_mean(jnp.asarray(feats), jnp.asarray(start), jnp.asarray(end)))
    for i in range(b):
        for j in range(k):
            ref = feats[i, start[i, j] : end[i, j]].mean(0)
            np.testing.assert_allclose(got[i, j], ref, atol=1e-5)


def test_empty_segment_is_zero(rng):
    feats = rng.normal(size=(1, 10, 4)).astype(np.float32)
    got = np.asarray(
        masked_segment_mean(jnp.asarray(feats), jnp.asarray([[5]]), jnp.asarray([[5]]))
    )
    np.testing.assert_array_equal(got, 0)


def test_proposal_mean_pool_matches_reference_loop(rng):
    """Reference: denorm spans by mask-sum duration, start=relu(floor),
    end=ceil, mean-pool each slice (cone/model.py:186-200)."""
    import math

    b, l, d, nq = 2, 30, 6, 5
    valid_l = [30, 22]
    feats = rng.normal(size=(b, l, d)).astype(np.float32)
    mask = np.zeros((b, l), np.float32)
    for i, vl in enumerate(valid_l):
        mask[i, :vl] = 1
        feats[i, vl:] = 0
    cxw = np.stack(
        [rng.uniform(0.2, 0.8, (b, nq)), rng.uniform(0.05, 0.3, (b, nq))], -1
    ).astype(np.float32)

    got = np.asarray(proposal_mean_pool(jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(cxw)))

    for i in range(b):
        dur = valid_l[i]
        for q in range(nq):
            st = (cxw[i, q, 0] - 0.5 * cxw[i, q, 1]) * dur
            ed = (cxw[i, q, 0] + 0.5 * cxw[i, q, 1]) * dur
            s = max(int(math.floor(st)), 0)
            e = int(math.ceil(ed))
            ref = feats[i, s:e].mean(0)
            np.testing.assert_allclose(got[i, q], ref, atol=1e-5)
