"""Edge cases: videos shorter than one window, single-token queries,
topk_window exceeding the window count."""

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data.dataset import GroundingDataset, QueryExample, TrainLoader
from cone_tpu.data.store import InMemoryArrayStore, TextFeatureStore
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params
from cone_tpu.utils.io import l2_normalize

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                          t_feat_dim=DIM, v_motion_feat_dim=DIM,
                          v_appear_feat_dim=DIM, max_q_l=8, max_v_l=32),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0,
                        topk_window=6, max_ctx_l=256),
        eval=EvalConfig(query_chunk=4, video_batch=2),
    )


@pytest.fixture(scope="module")
def short_ds(cfg):
    """Two videos: one SHORTER than a window (20 < 32 clips), one tiny (3)."""
    rng = np.random.default_rng(0)
    vids = {
        "short": l2_normalize(rng.normal(size=(20, DIM)).astype(np.float32)),
        "tiny": l2_normalize(rng.normal(size=(3, DIM)).astype(np.float32)),
    }
    toks, clss, examples = {}, {}, []
    for vid, (st, ed) in [("short", (4.0, 9.0)), ("tiny", (0.0, 2.0))]:
        qid = f"{vid}_q0"
        toks[qid] = rng.normal(size=(1, DIM)).astype(np.float32)  # 1 token
        clss[qid] = l2_normalize(rng.normal(size=(1, DIM)).astype(np.float32))
        examples.append(QueryExample(
            query_id=qid, query="q", video_id=vid, clip_id=vid,
            timestamps=[st, ed], duration=float(len(vids[vid])),
        ))
    text = TextFeatureStore(InMemoryArrayStore(toks), InMemoryArrayStore(clss))
    return GroundingDataset(examples, InMemoryArrayStore(vids), text, cfg.data)


def test_pipeline_on_short_videos(cfg, short_ds):
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, short_ds, cfg)
    for fused in [False, True]:
        subs, ranklists = pipe.run(host_postproc=not fused, fused=fused)
        assert set(ranklists) == {"short_q0", "tiny_q0"}
        # short video: ceil(20/16)+1 = 3 windows; tiny: ceil(3/16)+1 = 2
        assert sorted(ranklists["short_q0"]) == [0, 1, 2]
        assert sorted(ranklists["tiny_q0"]) == [0, 1]
        for row in subs["fusion"]:
            assert len(row["predicted_times"]) >= 1
            for t in row["predicted_times"]:
                vid_len = short_ds.video_features(row["clip_id"])[0].shape[0]
                assert -1e-4 <= t[0] <= vid_len + 1e-4


def test_train_sampling_on_short_video(cfg, short_ds):
    rng = np.random.default_rng(1)
    s = short_ds.sample_train(0, rng)  # "short" example
    assert s["pos_mask"].sum() > 0
    assert s["neg_mask"].sum() > 0
    c, w = s["span_labels"][0]
    assert 0 < w <= 1 + 1e-6
