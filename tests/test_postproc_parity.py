"""Submission post-processing vs the reference's own score_fusion +
post_processing_mr_nms outputs (fixture from tools/gen_golden_postproc.py)."""

import os

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data.dataset import QueryExample
from cone_tpu.eval.pipeline import InferencePipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "postproc.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no fixture")


class _PostprocOnly(InferencePipeline):
    """Skip model construction: only the host postproc methods are used."""

    def __init__(self, cfg):
        self.cfg = cfg


def test_postproc_matches_reference():
    g = dict(np.load(GOLDEN).items())
    cfg = ConeConfig(
        data=DataConfig(clip_length=1.0),
        eval=EvalConfig(nms_thd=0.5, max_before_nms=200, max_after_nms=5),
    )
    pipe = _PostprocOnly(cfg)

    n = int(g["n_queries"])
    rows = []
    for qi in range(n):
        k = g[f"q{qi}_prob"].shape[0]
        rows.append(
            dict(
                example=QueryExample(
                    query_id=f"q{qi}", query="", video_id="v", clip_id="v",
                    timestamps=[0, 0], duration=0.0,
                ),
                spans_sec=g[f"q{qi}_spans"],
                prob=g[f"q{qi}_prob"],
                match=g[f"q{qi}_match"],
                win_valid=np.ones(k, bool),
            )
        )
    subs = pipe.postprocess_host(rows)
    for qi in range(n):
        for name in ["proposal", "matching", "fusion"]:
            got = np.asarray(subs[name][qi]["predicted_times"], np.float64)
            want = g[f"q{qi}_{name}"]
            assert got.shape == want.shape, (qi, name, got.shape, want.shape)
            np.testing.assert_allclose(got, want, atol=1e-9,
                                       err_msg=f"{qi} {name}")


GOLDEN_MAD = os.path.join(os.path.dirname(__file__), "golden",
                          "postproc_mad.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN_MAD), reason="no fixture")
@pytest.mark.parametrize("thd,tag", [(0.5, "nms"), (-1.0, "raw")])
def test_postproc_matches_reference_mad_geometry(thd, tag):
    """TAN-MAD candidate geometry (30 windows x 10 proposals = 300
    candidates): max_before_nms=200 BINDS, with exact prob ties and
    duplicate spans at the truncation boundary, for both the NMS path and
    nms_thd=-1 (reference post_processing_mr_nms:108-127). Together with
    test_nms_device_parity (fused == host at this geometry) this pins
    reference == host == fused."""
    g = dict(np.load(GOLDEN_MAD).items())
    cfg = ConeConfig(
        data=DataConfig(clip_length=1.0),
        eval=EvalConfig(nms_thd=thd, max_before_nms=200, max_after_nms=5),
    )
    pipe = _PostprocOnly(cfg)
    n = int(g["n_queries"])
    rows = []
    for qi in range(n):
        k = g[f"q{qi}_prob"].shape[0]
        rows.append(
            dict(
                example=QueryExample(
                    query_id=f"q{qi}", query="", video_id="v", clip_id="v",
                    timestamps=[0, 0], duration=0.0,
                ),
                spans_sec=g[f"q{qi}_spans"],
                prob=g[f"q{qi}_prob"],
                match=g[f"q{qi}_match"],
                win_valid=np.ones(k, bool),
            )
        )
    subs = pipe.postprocess_host(rows)
    for qi in range(n):
        for name in ["proposal", "matching", "fusion"]:
            got = np.asarray(subs[name][qi]["predicted_times"], np.float64)
            want = g[f"q{qi}_{tag}_{name}"]
            assert got.shape == want.shape, (qi, name, got.shape, want.shape)
            np.testing.assert_allclose(got, want, atol=1e-9,
                                       err_msg=f"{qi} {tag} {name}")
