"""Full training loop: epochs, periodic eval, early stopping, checkpoints.

Orchestration equivalent of cone/train.py:122-229 — eval every
`eval_epoch_interval` epochs, stop score = mean of R@1 at IoU {0.3, 0.5}
for ego4d / mean of the R@1 row for MAD (cone/train.py:174-179), best/
latest/periodic checkpoints, `max_es_cnt` early-stop patience — with
per-stage timing meters (the reference's dataloading/forward/backward
AverageMeters, cone/train.py:41-56) and a jsonl metrics log.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Optional

import jax
import numpy as np

from cone_tpu.config import ConeConfig
from cone_tpu.data.dataset import GroundingDataset, TrainLoader
from cone_tpu.eval.metrics import (
    display_recall_table,
    display_window_results,
    evaluate_recall_table,
    evaluate_window_ranklists,
)
from cone_tpu.eval.pipeline import InferencePipeline
from cone_tpu.models.init import build_model_and_params
from cone_tpu.parallel.mesh import shard_batch
from cone_tpu.train.checkpoint import CheckpointManager
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step
from cone_tpu.utils.io import AverageMeter, save_jsonl
from cone_tpu.utils.logging import MetricLogger


def _stop_score(recall_table, dset_name: str) -> float:
    """recall_table is (topK, thresholds) with topK=[1,5,...] rows.

    ego4d: thresholds [0.3, 0.5] -> mean of R@1 row (cone/train.py:178).
    mad:   thresholds [0.1, 0.3, 0.5] -> mean of R@1 row (cone/train.py:175).
    """
    del dset_name
    return float(np.mean(recall_table[0]))


def build_family(cfg: ConeConfig, seed: int):
    """(model, params) for the configured model family."""
    if cfg.model.model_family == "tan":
        import jax.numpy as jnp

        from cone_tpu.models.tan import ConeTanModel

        tan = cfg.tan
        assert tan.num_clips * tan.frame_stride == cfg.data.max_v_l, (
            f"TAN geometry: num_clips*frame_stride ({tan.num_clips}*"
            f"{tan.frame_stride}) must equal data.max_v_l ({cfg.data.max_v_l})"
            " — the raw window is NUM_SAMPLE_CLIPS = num_clips*TARGET_STRIDE"
        )
        model = ConeTanModel(tan)
        var = model.init(
            {"params": jax.random.PRNGKey(seed)},
            jnp.zeros((2, cfg.data.max_q_l, tan.t_feat_dim)),
            jnp.ones((2, cfg.data.max_q_l)),
            # raw window length = num_clips * frame_stride (TARGET_STRIDE);
            # the frame layer pools it down to num_clips map cells
            jnp.zeros((2, tan.num_clips * tan.frame_stride, tan.v_feat_dim)),
            jnp.zeros((2, tan.v_feat_dim)),
            jnp.zeros((2, tan.num_clips * tan.frame_stride, tan.v_feat_dim)),
            method=ConeTanModel.init_all,
        )
        return model, var["params"]
    return build_model_and_params(cfg.model, seed=seed)


def _make_pipeline(model, params, eval_ds, cfg, mesh):
    if cfg.model.model_family == "tan":
        from cone_tpu.eval.tan_pipeline import TanInferencePipeline

        return TanInferencePipeline(
            model, params, eval_ds, cfg, cfg.tan,
            proposal_top_k=cfg.tan.proposal_top_k, mesh=mesh,
        )
    return InferencePipeline(model, params, eval_ds, cfg, mesh=mesh)


def evaluate(model, params, eval_ds: GroundingDataset, cfg: ConeConfig,
             mesh=None, host_postproc: bool = True, fused: bool = False):
    """Run inference + metrics on a flat-jsonl-style GT (the dataset's own
    examples). Returns dict with recall tables per modality + window recall."""
    pipe = _make_pipeline(model, params, eval_ds, cfg, mesh)
    subs, ranklists = pipe.run(
        host_postproc=host_postproc and not fused, fused=fused
    )
    gt = [dict(query_id=e.query_id, timestamps=e.timestamps) for e in eval_ds.examples]
    if cfg.data.dset_name == "mad":
        thresholds, topk = [0.1, 0.3, 0.5], [1, 5, 10, 50, 100]
        window_topk = [1, 5, 10, 30, 50, 100, 200]
    else:
        thresholds, topk = [0.3, 0.5], [1, 5, 10, 50, 100]
        window_topk = [1, 5, 10, 30, 50]

    out = {"submissions": subs, "ranklists": ranklists, "tables": {}}
    out["window_recall"] = evaluate_window_ranklists(
        ranklists, gt, window_topk, cfg.data.clip_length, cfg.data.max_v_l
    )
    out["tables"]["window"] = display_window_results(
        out["window_recall"], window_topk, title="Window Pre-filtering"
    )
    for name in subs:
        rec = evaluate_recall_table(subs[name], gt, thresholds, topk)
        out[f"recall_{name}"] = rec
        out["tables"][name] = display_recall_table(
            rec, thresholds, topk, title=name.capitalize()
        )
    # eval_modality selects which score variant drives early stopping
    # (cone/config.py:123, inference.py:479-493). "clip" is the value the
    # reference's own dispatch actually checks for the matching modality
    # (inference.py:489), so converted opt.json files carry it.
    modality = {"both": "fusion", "proposal": "proposal",
                "matching": "matching", "clip": "matching"}[cfg.eval.eval_modality]
    primary = (
        f"recall_{modality}" if f"recall_{modality}" in out
        else f"recall_{list(subs)[0]}"
    )
    out["stop_score"] = _stop_score(out[primary], cfg.data.dset_name)
    return out


def _snapshot_code_version(workdir: str) -> None:
    """Experiment provenance: record the exact code state (the reference
    zips the source tree per run, cone/config.py:205-211; a git commit +
    dirty diff is the same information, cheaper)."""
    import subprocess

    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                              capture_output=True, text=True, timeout=10)
        diff = subprocess.run(["git", "diff", "HEAD"], cwd=root,
                              capture_output=True, text=True, timeout=10)
        with open(os.path.join(workdir, "code_version.txt"), "w") as f:
            f.write(head.stdout)
            if diff.stdout:
                f.write("\n--- uncommitted diff ---\n")
                f.write(diff.stdout)
    except Exception:
        pass  # provenance is best-effort (no git in deployment images)


def train(
    cfg: ConeConfig,
    train_ds: GroundingDataset,
    eval_ds: Optional[GroundingDataset],
    workdir: str,
    mesh=None,
    profile: bool = False,
):
    """Train a CONE model; returns (params, history)."""
    os.makedirs(workdir, exist_ok=True)
    ckpt = CheckpointManager(workdir, cfg)
    logger = MetricLogger(workdir)
    _snapshot_code_version(workdir)

    model, params = build_family(cfg, seed=cfg.train.seed)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {cfg.model.model_family}, {n_params:,} parameters")
    loader = TrainLoader(train_ds, bsz=cfg.train.bsz, seed=cfg.train.seed)
    plateau = None
    if cfg.model.model_family == "tan":
        from cone_tpu.train.optim import ReduceLROnPlateau, make_tan_optimizer
        from cone_tpu.train.tan_step import make_tan_train_step

        # TAN family: Adam + ReduceLROnPlateau on the stop score
        # (cone_2dtan/moment_localization/train.py:143-147)
        tx = make_tan_optimizer(cfg.train)
        opt_state = tx.init(params)
        plateau = ReduceLROnPlateau(factor=cfg.train.plateau_factor,
                                    patience=cfg.train.plateau_patience)
        step_fn = make_tan_train_step(
            model, tx, cfg.tan, use_neg_loss=cfg.loss.neg_loss, mesh=mesh
        )
    else:
        tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
        opt_state = tx.init(params)
        step_fn = make_train_step(model, tx, cfg, mesh=mesh)

    start_epoch = 0
    if ckpt.exists("latest"):
        params, opt_state, start_epoch = ckpt.restore("latest", params, opt_state)
        start_epoch += 1
        print(f"resumed from epoch {start_epoch}")

    rng = jax.random.PRNGKey(cfg.train.seed)
    best_score, es_cnt = 0.0, 0
    history = []

    for epoch in range(start_epoch, cfg.train.n_epoch):
        meters = defaultdict(AverageMeter)
        loss_meters = defaultdict(AverageMeter)
        adapter_on = (
            cfg.loss.adapter_loss and epoch >= cfg.train.start_epoch_for_adapter
        )
        t_load = time.time()
        if profile and epoch == start_epoch:
            jax.profiler.start_trace(os.path.join(workdir, "profile"))
        from cone_tpu.data.prefetch import prefetch_iterator

        for batch in prefetch_iterator(loader.epoch(epoch)):
            meters["dataloading_time"].update(time.time() - t_load)
            t0 = time.time()
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            meters["prepare_inputs_time"].update(time.time() - t0)
            t0 = time.time()
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, sub, adapter_on
            )
            metrics = jax.device_get(metrics)
            meters["step_time"].update(time.time() - t0)
            for k, v in metrics.items():
                loss_meters[k].update(float(v))
            t_load = time.time()
        if profile and epoch == start_epoch:
            jax.profiler.stop_trace()

        epoch_log = {
            "epoch": epoch + 1,
            **{k: m.avg for k, m in loss_meters.items()},
            **{k: m.avg for k, m in meters.items()},
        }
        logger.log_train_epoch(epoch_log)
        history.append(epoch_log)

        do_eval = (
            eval_ds is not None
            and (epoch + 1) % cfg.train.eval_epoch_interval == 0
        )
        if do_eval:
            res = evaluate(model, params, eval_ds, cfg, mesh=mesh)
            for t in res["tables"].values():
                logger.log_text(t)
            score = res["stop_score"]
            lr_now = None
            if plateau is not None:
                opt_state, lr_now = plateau.step(score, opt_state)
                epoch_log["lr"] = lr_now
            logger.log_eval(epoch + 1, score, lr=lr_now)
            save_jsonl(
                res["submissions"]["fusion"],
                os.path.join(workdir, "latest_preds.jsonl"),
            )
            if score > best_score:
                best_score, es_cnt = score, 0
                ckpt.save("best", params, opt_state, epoch)
                save_jsonl(
                    res["submissions"]["fusion"],
                    os.path.join(workdir, "best_preds.jsonl"),
                )
            else:
                es_cnt += 1
                if cfg.train.max_es_cnt != -1 and es_cnt > cfg.train.max_es_cnt:
                    logger.log_text(f"Early stop at epoch {epoch}")
                    break
            ckpt.save("latest", params, opt_state, epoch)

        if (epoch + 1) % cfg.train.save_interval == 0 or (
            (epoch + 1) % cfg.train.lr_drop == 0
        ):
            ckpt.save(f"e{epoch:04d}", params, opt_state, epoch)

    return params, history
