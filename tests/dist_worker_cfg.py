"""Shared config/dataset recipe for the multi-process test: the worker
ranks AND the in-process single-device reference run must build the exact
same problem (seeded synthetic data is deterministic)."""

from cone_tpu.config import (
    ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig,
)
from cone_tpu.data import make_synthetic_dataset

DIM = 32


def make_cfg_and_ds():
    cfg = ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32,
        ),
        data=DataConfig(
            dset_name="synthetic", max_v_l=32, max_q_l=8, clip_length=1.0,
            topk_window=5, max_ctx_l=256, max_windows=5,
        ),
        train=TrainConfig(
            bsz=8, n_epoch=2, eval_epoch_interval=2, lr=3e-4,
            start_epoch_for_adapter=1, save_interval=100,
        ),
        eval=EvalConfig(query_chunk=4),
    )
    ds = make_synthetic_dataset(
        cfg.data, n_videos=4, queries_per_video=4, ctx_l_range=(100, 200),
        dim=DIM, signal=3.0, seed=7,
    )
    return cfg, ds


def make_corpus_queries(ds, n=6):
    """(token_feats_list, cls_feats) for the corpus-search phase — the
    first n examples' query features, identical on every rank."""
    import numpy as np

    toks, clss = [], []
    for ex in ds.examples[:n]:
        tok, cls = ds.query_features(ex.query_id)
        toks.append(tok)
        clss.append(cls)
    return toks, np.stack(clss)
