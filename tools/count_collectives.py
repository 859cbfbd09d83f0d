import os
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import re, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cone_tpu.config import ConeConfig, DataConfig, ModelConfig, TrainConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.data.dataset import TrainLoader
from cone_tpu.models.init import build_model_and_params
from cone_tpu.parallel.mesh import make_mesh, shard_params, tp_size, shard_batch
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step

dim = 32
cfg = ConeConfig(
    model=ModelConfig(hidden_dim=64, nheads=4, dim_feedforward=128,
                      t_feat_dim=dim, v_motion_feat_dim=dim, v_appear_feat_dim=dim,
                      max_q_l=8, max_v_l=32),
    data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0, max_windows=5),
    train=TrainConfig(bsz=8),
)

for tp in (1, 2):
    mesh = make_mesh(8, tp=tp)
    ds = make_synthetic_dataset(cfg.data, n_videos=2, queries_per_video=16,
                                ctx_l_range=(80, 120), dim=dim, seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(ds, bsz=8, seed=0)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    if tp_size(mesh) > 1:
        params = shard_params(params, mesh)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    batch = next(iter(loader.epoch(0)))
    batch = shard_batch(batch, mesh)
    import jax.random as jr
    txt = step.lower(params, opt_state, batch, jr.PRNGKey(0)).compile().as_text()
    # HLO instruction definitions: "%name = type op(" — count per op
    counts = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        counts[op] = len(re.findall(rf"= \S+ {re.escape(op)}(?:-start)?\(", txt))
    print(f"tp={tp} mesh={dict(mesh.shape)}: {counts}")
