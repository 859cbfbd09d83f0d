"""Worker process for tests/test_multiprocess.py: one rank of a real
2-process CPU cluster (2 virtual devices each -> 4-device global dp mesh).

Runs distributed training (global batches, per-process rows, XLA gradient
all-reduce over the Gloo backend) and the sharded+gathered eval, then dumps
a JSON summary the parent test compares across ranks and against a
single-process reference run.

Usage: python dist_worker.py <process_id> <port> <workdir> <out_prefix> \
           [num_processes]

num_processes=1 is the PRE-WARM mode: the same code path runs as a solo
"cluster" (coordination service + local mesh, no Gloo peers) before the real
2-process spawn, so module imports, the persistent compile cache and the OS
page cache are hot when the ranks race Gloo's hard ~30 s communicator
rendezvous window (see test_multiprocess.py).
"""

import json
import sys


def main():
    pid, port, workdir, out_prefix = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
    num_processes = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from cone_tpu.parallel.distributed import global_mesh, initialize

    # keep the GLOBAL device count at 4 in both modes so the mesh (and the
    # per-device batch shapes it induces) is identical
    initialize(f"127.0.0.1:{port}", num_processes=num_processes,
               process_id=pid, local_device_count=4 // num_processes)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 4 // num_processes

    from tests.dist_worker_cfg import make_cfg_and_ds

    cfg, ds = make_cfg_and_ds()

    from cone_tpu.train.loop import evaluate, train

    mesh = global_mesh()
    params, history = train(cfg, ds, ds, workdir, mesh=mesh)

    model_params_sum = float(sum(
        abs(x).sum() for x in map(jax.device_get, jax.tree.leaves(params))))

    from cone_tpu.train.loop import build_family

    model, _ = build_family(cfg, seed=cfg.train.seed)
    res = evaluate(model, params, ds, cfg, mesh=mesh)

    # multi-host corpus retrieval: each rank holds its shard of the video
    # library; the global budget + candidate rows merge over the control
    # plane, so both ranks must return the identical corpus-wide ranking
    from cone_tpu.parallel.distributed import shard_by_process
    from cone_tpu.serve.corpus import CorpusRetriever
    from tests.dist_worker_cfg import make_corpus_queries

    # fresh seeded params (not the trained ones) so the parent test can
    # reproduce the exact same retriever without re-training
    from cone_tpu.models.init import build_model_and_params

    cmodel, cparams = build_model_and_params(cfg.model, seed=cfg.train.seed)
    retr = CorpusRetriever(cmodel, cparams, cfg, dataset=None, fine_chunk=4)
    vids = sorted(ds.video_ids)
    for cid in shard_by_process(vids):
        retr.add_video(cid, ds.video_features(cid)[0])
    toks, clsv = make_corpus_queries(ds)
    hits = retr.search_batch(toks, clsv, top_moments=5)

    out = {
        "process": pid,
        "losses": [h["loss_overall"] for h in history],
        "param_sum": model_params_sum,
        "stop_score": res["stop_score"],
        "n_eval_rows": len(res["submissions"]["fusion"]),
        "n_ranklists": len(res["ranklists"]),
        "corpus_hits": [
            [[h["video_id"], h["span"][0], h["span"][1], h["fused"]]
             for h in per_q] for per_q in hits
        ],
    }
    with open(f"{out_prefix}.{pid}.json", "w") as f:
        json.dump(out, f)
    print(f"worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
