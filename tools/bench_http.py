"""HTTP serving front-end throughput (serve/server.py) on the real TPU.

Measures the full production path — HTTP request -> MomentService ->
CorpusRetriever -> fused device programs -> JSON — against a resident
MAD-scale corpus, three ways:

  * /search sequential: one client, one query per request (latency view;
    on the tunneled chip each request pays ~1-2 device dispatch RTTs).
  * /search concurrent: 8 client threads against the threaded server (the
    device lock serializes programs; overlap hides HTTP+host work).
  * /search_batch: 64 queries per request — the bulk surface; all queries
    share the per-bucket coarse scans and per-movie fine batching.

    python tools/bench_http.py        # no JAX_PLATFORMS override (axon)
"""

import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.serve.server import MomentService, make_server

    dim = 512
    ctx = 36000  # 2 h @ 5 fps movies
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=125, max_q_l=20,
                          compute_dtype="bfloat16"),
        data=DataConfig(dset_name="mad", max_v_l=125, clip_length=0.2,
                        topk_window=30, max_q_l=20, max_ctx_l=65536),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=16,
                        ctx_buckets=(8192, 16384, 24576, 36864, 49152),
                        corpus_dtype="int8"),
    )
    n_videos = 4
    ds = make_synthetic_dataset(cfg.data, n_videos=n_videos,
                                queries_per_video=32,
                                ctx_l_range=(ctx - 5, ctx), dim=dim,
                                q_len_range=(8, 20), seed=0)
    print(f"devices: {jax.devices()} | corpus: {n_videos} movies x {ctx}"
          f" clips (int8 resident)", file=sys.stderr)

    model, params = build_model_and_params(cfg.model, seed=0)
    service = MomentService(model, params, cfg, dataset=ds)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    import base64

    qs = []
    for ex in ds.examples[:64]:
        tok, cls = ds.query_features(ex.query_id)
        qs.append({
            "token_features_b64":
                base64.b64encode(np.ascontiguousarray(tok, "<f4")).decode(),
            "token_shape": list(tok.shape),
            "cls_feature_b64":
                base64.b64encode(np.ascontiguousarray(cls, "<f4")).decode(),
        })

    # warmup (compile all bucket programs)
    t0 = time.time()
    post("/search", qs[0])
    print(f"warmup (compile): {time.time() - t0:.1f}s", file=sys.stderr)

    results = {}
    n = 32
    t0 = time.time()
    for i in range(n):
        post("/search", qs[i % len(qs)])
    dt = time.time() - t0
    results["sequential_qps"] = round(n / dt, 2)
    print(f"/search sequential: {n} reqs in {dt:.2f}s"
          f" -> {n / dt:.2f} req/s", file=sys.stderr)

    with ThreadPoolExecutor(8) as pool:
        t0 = time.time()
        list(pool.map(lambda q: post("/search", q),
                      [qs[i % len(qs)] for i in range(n)]))
        dt = time.time() - t0
    results["concurrent8_qps"] = round(n / dt, 2)
    print(f"/search 8 threads: {n} reqs in {dt:.2f}s"
          f" -> {n / dt:.2f} req/s", file=sys.stderr)

    # dynamic micro-batching (cli serve --batch_window_ms): the same 8
    # concurrent clients, but arrivals inside a 20 ms window share one
    # search_batch device sweep (serve/server.py _MicroBatcher)
    from cone_tpu.serve.server import _MicroBatcher

    service.batcher = _MicroBatcher(service, 0.02, 32)
    with ThreadPoolExecutor(8) as pool:  # warm the batched-sweep programs
        list(pool.map(lambda q: post("/search", q), qs[:8]))
    with ThreadPoolExecutor(8) as pool:
        t0 = time.time()
        list(pool.map(lambda q: post("/search", q),
                      [qs[i % len(qs)] for i in range(n)]))
        dt = time.time() - t0
    b = service.batcher
    results["concurrent8_microbatched_qps"] = round(n / dt, 2)
    results["mean_dyn_batch"] = round(
        b.batched_queries / max(b.batches, 1), 2)
    print(f"/search 8 threads + micro-batching: {n} reqs in {dt:.2f}s"
          f" -> {n / dt:.2f} req/s (mean batch "
          f"{results['mean_dyn_batch']})", file=sys.stderr)
    service.batcher = None

    for _ in range(2):  # second run = steady state
        t0 = time.time()
        body = post("/search_batch", {"queries": qs, "top_moments": 5})
        dt = time.time() - t0
    assert len(body["results"]) == len(qs)
    results["batch64_qps"] = round(len(qs) / dt, 2)
    print(f"/search_batch: {len(qs)} queries in {dt:.2f}s"
          f" -> {len(qs) / dt:.2f} q/s", file=sys.stderr)

    srv.shutdown()
    print(json.dumps({"metric": "http_search_qps",
                      "value": results["batch64_qps"],
                      "unit": "queries/sec", **results}))


if __name__ == "__main__":
    main()
