"""Full training loop: epochs, periodic eval, early stopping, checkpoints.

Orchestration equivalent of cone/train.py:122-229 — eval every
`eval_epoch_interval` epochs, stop score = mean of R@1 at IoU {0.3, 0.5}
for ego4d / mean of the R@1 row for MAD (cone/train.py:174-179), best/
latest/periodic checkpoints, `max_es_cnt` early-stop patience — with
per-stage timing meters (the reference's dataloading/forward/backward
AverageMeters, cone/train.py:41-56) and a jsonl metrics log.
"""

from __future__ import annotations

import json
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
    mean_first_iou,
)
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
    from cone_tpu.eval.pipeline import make_pipeline

    return make_pipeline(model, params, eval_ds, cfg, mesh=mesh)


def evaluate(model, params, eval_ds: GroundingDataset, cfg: ConeConfig,
             mesh=None, host_postproc: bool = True, fused: bool = False):
    """Run inference + metrics on a flat-jsonl-style GT (the dataset's own
    examples). Returns dict with recall tables per modality + window recall.

    Multi-host: videos shard by process over DCN (each host grounds its
    shard on its LOCAL devices — zero cross-host traffic in the compute),
    submission rows merge at the end, every process computes the full
    metric table so early stopping stays consistent
    (parallel/distributed.py)."""
    if cfg.train.debug:
        # smoke mode: one query chunk end-to-end (GT below is built from the
        # same truncated example list, so the metric tables stay consistent)
        import copy

        eval_ds = copy.copy(eval_ds)
        eval_ds.examples = eval_ds.examples[: max(cfg.eval.query_chunk, 8)]
    from cone_tpu.parallel.mesh import dp_submesh, tp_size

    if tp_size(mesh) > 1:
        # eval shards QUERIES, not params: flatten (dp, tp) into one dp axis
        # so every device does data parallelism, and pull the tensor-sharded
        # training params to host for the replicated pipeline programs
        params = jax.device_get(params)
        mesh = dp_submesh(mesh)
    ds_local, multi = eval_ds, jax.process_count() > 1
    if multi:
        import copy

        from cone_tpu.parallel.distributed import local_mesh, shard_by_process

        vids = sorted({e.clip_id for e in eval_ds.examples})
        mine = set(shard_by_process(vids))
        ds_local = copy.copy(eval_ds)
        ds_local.examples = [e for e in eval_ds.examples if e.clip_id in mine]
        mesh = local_mesh() if mesh is not None else None
        # training params live on the global mesh; pull to host so the
        # local-mesh pipeline programs can consume them
        params = jax.device_get(params)
    pipe = _make_pipeline(model, params, ds_local, cfg, mesh)
    subs, ranklists = pipe.run(
        host_postproc=host_postproc and not fused, fused=fused
    )
    if multi:
        from cone_tpu.parallel.distributed import all_gather_rows

        subs = {name: all_gather_rows(rows) for name, rows in subs.items()}
        ranklists = {
            row["qid"]: row["rank"]
            for row in all_gather_rows(
                [{"qid": q, "rank": r} for q, r in ranklists.items()])
        }
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
    # ego4d evals also report mIoU of the first prediction alongside recall
    # (cone/inference.py:440-444 via evaluate_ego4d_nlq.py:95-117)
    with_miou = cfg.data.dset_name != "mad"
    for name in subs:
        rec = evaluate_recall_table(subs[name], gt, thresholds, topk)
        out[f"recall_{name}"] = rec
        miou = mean_first_iou(subs[name], gt) if with_miou else None
        if miou is not None:
            out[f"miou_{name}"] = miou
        out["tables"][name] = display_recall_table(
            rec, thresholds, topk, title=name.capitalize(), mIoU=miou
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


def eval_criterion_losses(eval_loss_fn, params, eval_ds: GroundingDataset,
                          cfg: ConeConfig, adapter_on: bool) -> dict:
    """Criterion loss terms on the eval split: the same windowed batches the
    train step consumes, sampled with a FIXED seed (seed, epoch=0) so every
    eval scores the identical window set — the curves are comparable across
    epochs, a cheap overfitting signal (the reference's eval-loss TB channel,
    cone/inference.py:30-36, 96-98). Runs forward-only with dropout off on
    each host's local devices (no collectives, so multi-host processes just
    compute the same numbers)."""
    import itertools

    bsz = min(cfg.train.bsz, len(eval_ds))
    if bsz == 0:
        return {}
    loader = TrainLoader(eval_ds, bsz=bsz, seed=cfg.train.seed)
    meters = defaultdict(AverageMeter)
    batches = loader.epoch(0)
    if cfg.train.debug:
        batches = itertools.islice(batches, 2)
    for batch in batches:
        losses = jax.device_get(eval_loss_fn(params, batch, adapter_on))
        for k, v in losses.items():
            meters[k].update(float(v))
    return {k: m.avg for k, m in meters.items()}


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
    init_ckpt: Optional[str] = None,
):
    """Train a CONE model; returns (params, history).

    init_ckpt: weights-only warm start — load model params (NOT optimizer or
    epoch) from any CheckpointManager file or tools/convert_ckpt.py output
    before training, the reference's --resume-without---resume_all path for
    fine-tuning from a released/converted checkpoint (cone/config.py:63-66,
    inference.py:525-533). Ignored when the workdir already holds a `latest`
    checkpoint (an interrupted run resumes itself in full).

    Multi-host: pass the GLOBAL mesh (parallel/distributed.global_mesh after
    distributed.initialize). Every process builds identical batches and
    contributes its local rows (parallel/mesh.shard_batch); XLA's gradient
    all-reduce rides ICI within a slice and DCN across. Process 0 owns the
    checkpoint/log writes; evals shard videos by process and re-merge, so
    the stop score (and early stopping) is identical everywhere."""
    multi = jax.process_count() > 1
    is_main = jax.process_index() == 0
    os.makedirs(workdir, exist_ok=True)
    ckpt = CheckpointManager(workdir, cfg if is_main else None)
    logger = MetricLogger(workdir) if is_main else None
    if is_main:
        _snapshot_code_version(workdir)
        logger.log_hparams(json.loads(cfg.to_json()))

    model, params = build_family(cfg, seed=cfg.train.seed)
    if init_ckpt and not ckpt.exists("latest"):
        from cone_tpu.train.checkpoint import load_params

        params = load_params(init_ckpt, params)
        print(f"warm start: params from {init_ckpt}")
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {cfg.model.model_family}, {n_params:,} parameters")
    if cfg.train.multiscale:
        # ECCV'22 leaderboard recipe: 3 extra variable-length windows per
        # example (data/multiscale.py). CONE family, single host only.
        from cone_tpu.data.multiscale import MultiscaleTrainLoader

        assert cfg.model.model_family != "tan", "multiscale is CONE-only"
        assert not multi, (
            "train.multiscale is single-host: the [std; extra] batch layout"
            " cannot be row-sliced per process")
        loader = MultiscaleTrainLoader(train_ds, bsz=cfg.train.bsz,
                                       seed=cfg.train.seed)
    else:
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
            model, tx, cfg.tan, use_neg_loss=cfg.loss.neg_loss, mesh=mesh,
            adapter_loss_coef=cfg.loss.adapter_loss_coef,
        )
    else:
        tx = make_optimizer(params, cfg.train, loader.steps_per_epoch())
        opt_state = tx.init(params)
        step_fn = make_train_step(model, tx, cfg, mesh=mesh)

    eval_loss_fn = None
    if eval_ds is not None and cfg.eval.criterion_losses:
        # local-device forward (mesh=None): the pass has no collectives and
        # stays valid whatever mesh/multi-host layout training runs under
        if cfg.model.model_family == "tan":
            from cone_tpu.train.tan_step import make_tan_eval_loss_step

            eval_loss_fn = make_tan_eval_loss_step(
                model, cfg.tan, use_neg_loss=cfg.loss.neg_loss,
                adapter_loss_coef=cfg.loss.adapter_loss_coef)
        else:
            from cone_tpu.train.step import make_eval_loss_step

            eval_loss_fn = make_eval_loss_step(model, cfg)

    start_epoch = 0
    best_score, es_cnt = 0.0, 0
    if multi:
        from cone_tpu.parallel.distributed import assert_same_across_processes

        assert mesh is not None, "multi-process training requires the global mesh"
        assert_same_across_processes(
            float(ckpt.exists("latest")),
            "resume state (multi-host training needs a shared workdir)")
    if ckpt.exists("latest"):
        params, opt_state, start_epoch, extra = ckpt.restore(
            "latest", params, opt_state)
        start_epoch += 1
        # exact resume: early-stop counters + plateau scheduler state come
        # back too (the reference saves lr_scheduler.state_dict(),
        # cone/train.py:184-191)
        best_score = extra.get("best_score", 0.0)
        es_cnt = int(extra.get("es_cnt", 0))
        if plateau is not None:
            plateau.best = extra.get("plateau_best", plateau.best)
            plateau.num_bad = int(extra.get("plateau_num_bad", 0))
        print(f"resumed from epoch {start_epoch}")

    if multi:
        # params/optimizer live as fully-replicated GLOBAL arrays so the
        # pjit'd step can consume and donate them across hosts
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        params = jax.device_put(jax.device_get(params), rep)
        opt_state = jax.device_put(jax.device_get(opt_state), rep)
    from cone_tpu.parallel.mesh import tp_size

    if tp_size(mesh) > 1:
        # dp x tp: tensor-shard the transformer matmul params Megatron-style
        # (parallel/mesh.param_shardings); the step's jit respects these
        # committed layouts. The optimizer state's moment trees nest the
        # param tree verbatim, so the same path-suffix rules shard them to
        # matching layouts (scalars like step counts replicate) — works for
        # a fresh init AND a checkpoint-restored host tree.
        assert not multi, (
            "tensor parallelism (train.tp_devices > 1) is single-process: "
            "tp all-reduces must ride ICI, not DCN")
        from cone_tpu.parallel.mesh import param_shardings, shard_params

        params = shard_params(params, mesh)
        opt_state = jax.device_put(
            jax.device_get(opt_state), param_shardings(opt_state, mesh))

    def _extra():
        out = {"best_score": best_score, "es_cnt": es_cnt}
        if plateau is not None:
            out["plateau_best"] = plateau.best
            out["plateau_num_bad"] = plateau.num_bad
        return out

    if cfg.train.rng_impl == "threefry":
        rng = jax.random.PRNGKey(cfg.train.seed)
    else:
        # typed key: the impl travels with the key through split/dropout,
        # so the whole step uses it (config.py TrainConfig.rng_impl)
        rng = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
    history = []

    for epoch in range(start_epoch, cfg.train.n_epoch):
        if multi:
            # align ranks before the epoch's first cross-host collective:
            # Gloo's lazy communicator setup has a ~30 s rendezvous window
            # and compile/IO skew between ranks can exceed it
            # (parallel/distributed.barrier)
            from cone_tpu.parallel.distributed import barrier

            barrier(f"epoch{epoch}")
        meters = defaultdict(AverageMeter)
        loss_meters = defaultdict(AverageMeter)
        adapter_on = (
            cfg.loss.adapter_loss and epoch >= cfg.train.start_epoch_for_adapter
        )
        t_load = time.time()
        if profile and epoch == start_epoch:
            jax.profiler.start_trace(os.path.join(workdir, "profile"))
        from cone_tpu.data.prefetch import prefetch_iterator

        if multi:
            # each process materializes ONLY its row block of every global
            # batch (per-sample seeded rng makes the rows identical to a
            # single-process build; no P-times feature-read amplification)
            pc, pi = jax.process_count(), jax.process_index()
            assert cfg.train.bsz % pc == 0, (cfg.train.bsz, pc)
            per = cfg.train.bsz // pc
            batches = loader.epoch(epoch, lo=pi * per, hi=(pi + 1) * per)
        else:
            batches = loader.epoch(epoch)
        if cfg.train.debug:
            import itertools

            batches = itertools.islice(batches, 3)
        for batch in prefetch_iterator(batches):
            meters["dataloading_time"].update(time.time() - t_load)
            t0 = time.time()
            if mesh is not None:
                batch = shard_batch(batch, mesh, local=multi)
            meters["prepare_inputs_time"].update(time.time() - t0)
            if multi and epoch == start_epoch and meters["step_time"].count == 0:
                # align ranks right before the FIRST step execution: the
                # epoch barrier above still leaves loader + shard_batch +
                # executable load between it and the first Gloo collective,
                # and on a contended single-core host that skew can exceed
                # Gloo's hard ~30 s communicator-rendezvous window
                from cone_tpu.parallel.distributed import barrier

                barrier("first-step")
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
        if is_main:
            logger.log_train_epoch(epoch_log)
        history.append(epoch_log)

        do_eval = (
            eval_ds is not None
            and (epoch + 1) % cfg.train.eval_epoch_interval == 0
        )
        if do_eval:
            # eval.fused_train_eval routes the eval through the fused device
            # path (bit-identical to host postproc since the device dedup +
            # max_before_nms parity work; keeps MAD-scale eval epochs off
            # host Python)
            res = evaluate(model, params, eval_ds, cfg, mesh=mesh,
                           host_postproc=not cfg.eval.fused_train_eval,
                           fused=cfg.eval.fused_train_eval)
            score = res["stop_score"]
            if multi:
                # the stop score drives early stopping on every process —
                # divergence would deadlock the collectives
                assert_same_across_processes(score, "stop score")
            eval_losses = None
            if eval_loss_fn is not None:
                eval_losses = eval_criterion_losses(
                    eval_loss_fn,
                    jax.device_get(params) if multi else params,
                    eval_ds, cfg, adapter_on)
                epoch_log.update(
                    {f"eval_{k}": v for k, v in eval_losses.items()})
            lr_now = None
            if plateau is not None:
                opt_state, lr_now = plateau.step(score, opt_state)
                epoch_log["lr"] = lr_now
            if is_main:
                for t in res["tables"].values():
                    logger.log_text(t)
                logger.log_eval(epoch + 1, score, lr=lr_now,
                                losses=eval_losses)
                save_jsonl(
                    res["submissions"]["fusion"],
                    os.path.join(workdir, "latest_preds.jsonl"),
                )
            if score > best_score:
                best_score, es_cnt = score, 0
                if is_main:
                    ckpt.save("best", params, opt_state, epoch, extra=_extra())
                    save_jsonl(
                        res["submissions"]["fusion"],
                        os.path.join(workdir, "best_preds.jsonl"),
                    )
            else:
                es_cnt += 1
                if cfg.train.max_es_cnt != -1 and es_cnt > cfg.train.max_es_cnt:
                    if is_main:
                        logger.log_text(f"Early stop at epoch {epoch}")
                    break
            if is_main:
                ckpt.save("latest", params, opt_state, epoch, extra=_extra())

        if is_main and ((epoch + 1) % cfg.train.save_interval == 0 or (
            (epoch + 1) % cfg.train.lr_drop == 0
        )):
            ckpt.save(f"e{epoch:04d}", params, opt_state, epoch, extra=_extra())

    return params, history
