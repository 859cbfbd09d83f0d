"""Full training loop with the TAN model family (config-driven dispatch)."""

import os

import numpy as np
import pytest

from cone_tpu.config import (
    ConeConfig, DataConfig, EvalConfig, ModelConfig, TanConfig, TrainConfig,
)
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.train.loop import train

DIM = 32
NC = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(model_family="tan", t_feat_dim=DIM,
                          v_appear_feat_dim=DIM, v_motion_feat_dim=DIM,
                          max_q_l=8, max_v_l=NC, adapter_module="linear"),
        tan=TanConfig(num_clips=NC, hidden_size=48, v_feat_dim=DIM,
                      t_feat_dim=DIM, txt_hidden_size=48, lstm_layers=2,
                      num_scale_layers=(8, 4), map_hidden_sizes=(48, 48),
                      map_kernel_sizes=(5, 5), map_paddings=(4, 0),
                      proposal_top_k=5),
        data=DataConfig(dset_name="synthetic", max_v_l=NC, max_q_l=8,
                        clip_length=1.0, topk_window=4, max_ctx_l=256),
        train=TrainConfig(bsz=8, n_epoch=2, eval_epoch_interval=2,
                          save_interval=100, start_epoch_for_adapter=0),
        eval=EvalConfig(query_chunk=4),
    )


def test_tan_family_train_loop(cfg, tmp_path):
    ds = make_synthetic_dataset(cfg.data, n_videos=4, queries_per_video=4,
                                ctx_l_range=(90, 180), dim=DIM, signal=3.0,
                                seed=13)
    workdir = str(tmp_path / "tanrun")
    params, history = train(cfg, ds, ds, workdir)
    assert len(history) == 2
    assert all(np.isfinite(h["loss_overall"]) for h in history)
    assert "loss_bce" in history[0] and "loss_adapter" in history[0]
    assert os.path.exists(os.path.join(workdir, "model_best.msgpack"))
    # config round-trip preserves the tan section
    from cone_tpu.train.checkpoint import CheckpointManager

    cfg2 = CheckpointManager.load_config(workdir)
    assert cfg2.model.model_family == "tan"
    assert cfg2.tan.num_scale_layers == (8, 4)
