"""TAN within-window NMS vs a transcription of the reference's standard-
union nms (cone_2dtan/lib/core/eval.py:34-56 / moment_localization/
test.py:242-289), plus evaluate(fused=True)."""

import numpy as np
import pytest

from cone_tpu.ops.nms import temporal_nms_host


def ref_2dtan_nms(dets, thresh, top_k):
    """Transcription of the reference's pure-numpy nms."""
    if len(dets) == 0:
        return []
    order = np.arange(len(dets))
    dets = np.array(dets, np.float64)
    x1, x2 = dets[:, 0], dets[:, 1]
    lengths = x2 - x1
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if len(keep) == top_k:
            break
        xx1 = np.maximum(x1[i], x1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1)
        ovr = inter / (lengths[i] + lengths[order[1:]] - inter)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return dets[keep]


@pytest.mark.parametrize("n,thresh,k", [(40, 0.3, 10), (100, 0.5, 5)])
def test_union_nms_matches_reference(rng, n, thresh, k):
    st = rng.uniform(0, 60, n)
    dur = rng.uniform(1, 20, n)
    score = np.sort(rng.uniform(0, 1, n))[::-1]  # pre-sorted like reference
    dets = [[float(s), float(s + d)] for s, d in zip(st, dur)]

    want = ref_2dtan_nms(dets, thresh, k)
    got = temporal_nms_host(
        [[d[0], d[1], float(sc)] for d, sc in zip(dets, score)],
        nms_thd=thresh, max_after_nms=k, hull_union=False,
    )
    # reference suppresses ovr > thresh (keeps ovr <= thresh); ours uses
    # iou > thd too — same comparison
    got_spans = np.asarray([g[:2] for g in got])
    assert got_spans.shape == np.asarray(want)[:, :2].shape
    np.testing.assert_allclose(got_spans, np.asarray(want)[:, :2], atol=1e-9)


def test_evaluate_fused_path():
    from cone_tpu.config import (ConeConfig, DataConfig, EvalConfig,
                                 ModelConfig)
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.train.loop import evaluate

    dim = 32
    cfg = ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_q_l=8, max_v_l=32,
                          adapter_module="none"),
        data=DataConfig(dset_name="synthetic", max_v_l=32, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        eval=EvalConfig(query_chunk=4, video_batch=2),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=4,
                                ctx_l_range=(100, 150), dim=dim, signal=3.0,
                                seed=31)
    model, params = build_model_and_params(cfg.model, seed=0)
    res = evaluate(model, params, ds, cfg, fused=True)
    assert "recall_fusion" in res
    assert np.isfinite(res["stop_score"])
    assert res["window_recall"][-1] > 0
