"""Hungarian matcher vs scipy.optimize.linear_sum_assignment (what the
reference calls at cone/matcher.py:105)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from cone_tpu.ops.matching import hungarian_match, matcher_cost


@pytest.mark.parametrize("nq,max_nt", [(5, 5), (5, 1), (6, 3)])
def test_match_equals_scipy(rng, nq, max_nt):
    b = 32
    cost = rng.normal(size=(b, nq, max_nt)).astype(np.float32)
    nts = rng.integers(1, max_nt + 1, size=b)
    mask = (np.arange(max_nt)[None] < nts[:, None]).astype(np.float32)

    assign = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(mask)))
    for i in range(b):
        nt = nts[i]
        rows, cols = linear_sum_assignment(cost[i, :, :nt])
        # scipy returns rows sorted; rebuild target->query map
        scipy_assign = np.empty(nt, np.int64)
        scipy_assign[cols] = rows
        got = assign[i, :nt]
        # equal optimal cost (assignments may differ only on exact ties)
        got_cost = cost[i, got, np.arange(nt)].sum()
        scipy_cost = cost[i, scipy_assign, np.arange(nt)].sum()
        assert abs(got_cost - scipy_cost) < 1e-5
        assert len(set(got.tolist())) == nt  # injective


def test_matcher_cost_matches_reference_formula(rng):
    """Replicates the flatten-batch cost build of cone/matcher.py:61-95
    block-diagonally and compares."""
    import torch

    b, nq = 4, 5
    pred_spans = rng.uniform(0.1, 0.9, size=(b, nq, 2)).astype(np.float32)
    pred_spans[..., 1] *= 0.3  # widths small & positive
    logits = rng.normal(size=(b, nq, 2)).astype(np.float32)
    tgt = rng.uniform(0.2, 0.8, size=(b, 1, 2)).astype(np.float32)
    tgt[..., 1] *= 0.2

    got = np.asarray(
        matcher_cost(jnp.asarray(pred_spans), jnp.asarray(logits), jnp.asarray(tgt))
    )

    # reference formula, per batch element
    t_spans = torch.tensor(pred_spans)
    t_logits = torch.tensor(logits)
    for i in range(b):
        prob = t_logits[i].softmax(-1)[:, 0]
        cost_class = -prob
        cost_span = torch.cdist(t_spans[i], torch.tensor(tgt[i]), p=1)

        def cxw_to_xx(x):
            return torch.stack([x[..., 0] - 0.5 * x[..., 1], x[..., 0] + 0.5 * x[..., 1]], -1)

        p_xx = cxw_to_xx(t_spans[i])
        t_xx = cxw_to_xx(torch.tensor(tgt[i]))
        inter = (torch.min(p_xx[:, None, 1], t_xx[None, :, 1]) - torch.max(p_xx[:, None, 0], t_xx[None, :, 0])).clamp(min=0)
        union = (p_xx[:, 1] - p_xx[:, 0])[:, None] + (t_xx[:, 1] - t_xx[:, 0])[None] - inter
        iou = inter / union
        encl = (torch.max(p_xx[:, None, 1], t_xx[None, :, 1]) - torch.min(p_xx[:, None, 0], t_xx[None, :, 0])).clamp(min=0)
        giou = iou - (encl - union) / encl
        ref = 10.0 * cost_span + 1.0 * (-giou) + 4.0 * cost_class[:, None]
        np.testing.assert_allclose(got[i], ref.numpy(), atol=1e-5)
