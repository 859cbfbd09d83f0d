"""Loss-tracking A/B for the throughput-optimal training recipe.

tools/bench_train_bsz.py showed bsz 32 -> 128 is +50% samples/s on v5e
(the reference trains at 32, cone/scripts/train_ego4d.sh). Throughput
alone doesn't justify changing a preset: a 4x batch takes 4x fewer
optimizer steps per epoch, so the lr must scale or the model undertrains.
This A/B trains the same synthetic corpus for the same SAMPLE budget under

  * the reference recipe   bsz  32, lr 1e-4;
  * linear lr scaling      bsz 128, lr 4e-4 (Goyal et al.: lr ~ bsz);
  * sqrt lr scaling        bsz 128, lr 2e-4;
  * no scaling (control)   bsz 128, lr 1e-4 — expected to lag;

and prints the eval-split criterion loss (fixed window seed, dropout off
— train/loop.py eval_criterion_losses) vs samples seen. The recipe is
encoded in ego4d_scratch_config / mad_scratch_config iff one of the
scaled variants tracks the bsz-32 trajectory; the measured table lands in
docs/RESULTS.md.

    python tools/bench_train_recipe_ab.py     # real TPU (no JAX_PLATFORMS)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EPOCHS = 30            # x 1024 samples = 30 720-sample budget per recipe
EVAL_EVERY = 5         # epochs between eval-loss points


def run_recipe(bsz: int, lr: float):
    import jax

    from cone_tpu.config import (ConeConfig, DataConfig, ModelConfig,
                                 TrainConfig)
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.data.dataset import TrainLoader
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.train.loop import eval_criterion_losses
    from cone_tpu.train.optim import make_optimizer
    from cone_tpu.train.step import make_eval_loss_step, make_train_step
    from cone_tpu.utils.perf import tunnel_sync

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16", seq_pad_multiple=16),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535),
        train=TrainConfig(bsz=bsz, lr=lr),
    )
    # one fixed synthetic corpus for every recipe (seeds shared)
    train_ds = make_synthetic_dataset(cfg.data, n_videos=8,
                                      queries_per_video=128,
                                      ctx_l_range=(900, 1200), dim=dim,
                                      seed=7)
    eval_ds = make_synthetic_dataset(cfg.data, n_videos=2,
                                     queries_per_video=32,
                                     ctx_l_range=(900, 1200), dim=dim,
                                     seed=11)
    model, params = build_model_and_params(cfg.model, seed=0)
    loader = TrainLoader(train_ds, bsz=bsz, seed=cfg.train.seed)
    tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    eval_loss_fn = make_eval_loss_step(model, cfg)
    rng = jax.random.PRNGKey(0)

    points = []
    t0 = time.time()
    for epoch in range(EPOCHS):
        for batch in loader.epoch(epoch):
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, batch, sub, True)
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == 0:
            losses = eval_criterion_losses(eval_loss_fn, params, eval_ds,
                                           cfg, adapter_on=True)
            points.append(((epoch + 1) * len(train_ds),
                           losses["loss_overall"]))
            print(f"  bsz={bsz} lr={lr:g}: epoch {epoch + 1:3d} "
                  f"({points[-1][0]} samples) eval loss_overall "
                  f"{points[-1][1]:.4f}", file=sys.stderr, flush=True)
    tunnel_sync(m["loss_overall"])
    print(f"  bsz={bsz} lr={lr:g}: {time.time() - t0:.0f}s wall",
          file=sys.stderr)
    return points


def main():
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    print(f"devices: {jax.devices()}", file=sys.stderr)

    recipes = [(32, 1e-4), (128, 4e-4), (128, 2e-4), (128, 1e-4)]
    curves = {}
    for bsz, lr in recipes:
        print(f"recipe bsz={bsz} lr={lr:g}", file=sys.stderr)
        curves[(bsz, lr)] = run_recipe(bsz, lr)

    print("\neval loss_overall vs samples seen")
    header = "samples".ljust(10) + "".join(
        f"b{b}/lr{lr:g}".rjust(14) for b, lr in recipes)
    print(header)
    for i, (samples, _) in enumerate(curves[recipes[0]]):
        row = f"{samples:<10d}"
        for r in recipes:
            row += f"{curves[r][i][1]:>14.4f}"
        print(row)


if __name__ == "__main__":
    main()
