"""Where do 2D-TAN's 430 ms/pass go? Per-stage device timing on the real
TPU at the bench.py TAN geometry (tan_ego4d, qc=8 x topk=20 = 160 windows
per dispatch), plus per-conv-layer MXU efficiency.

Stages timed (each a separately jitted program, tunnel_sync-fenced,
dispatches chained so tunnel latency overlaps — same discipline as
utils/perf.device_time_fused):
  * full fused dispatch (the production program, via device_time_fused);
  * TAN core: frame pool -> sparse map -> LSTM fusion -> map convs -> pred
    (models/tan.py ConeTanModel.__call__);
  * map-conv stack alone (MapConv, the K9L4 analytic-FLOPs giant);
  * fusion alone (3-layer LSTM + tex/vis 1x1 + normalized Hadamard);
  * frame + sparse-cascade scatter alone;
  * within-window NMS (ops/nms.py temporal_nms_device, 128-candidate pool,
    a 128-iteration fori_loop — serial, zero matmul FLOPs);
  * matching branch (segment-mean pool + adapter + cosine);
  * each map conv layer in isolation (lax.conv at 88/80/72/64 map sizes)
    with its achieved TFLOP/s vs the 197 bf16 peak.

Reference for what is being accounted: cone_2dtan/lib/models/
map_modules/map_conv.py:6, prop_modules/sparse.py:43-125,
moment_localization/test.py:285-289 (the within-window NMS).

    python tools/bench_tan_breakdown.py      # no JAX_PLATFORMS override
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cone_tpu.utils.perf import CHIP_PEAKS  # noqa: E402

PEAK_BF16 = CHIP_PEAKS["v5e"]["flops_bf16"]


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import EvalConfig, tan_ego4d_config
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import make_pipeline
    from cone_tpu.models.tan import ConeTanModel
    from cone_tpu.train.loop import build_family
    from cone_tpu.utils.perf import (device_time_fused, sync_latency,
                                     tan_flops_per_query, tunnel_sync)

    print(f"devices: {jax.devices()}", file=sys.stderr)

    dim = 256
    cfg = tan_ego4d_config()
    cfg = cfg.replace(
        tan=dataclasses.replace(cfg.tan, t_feat_dim=dim),
        model=dataclasses.replace(cfg.model, t_feat_dim=dim),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=8,
                        video_batch=1, corpus_dtype="int8"),
    )
    t = cfg.tan
    qc, topk = cfg.eval.query_chunk, cfg.data.topk_window
    b = qc * topk                      # windows per fused dispatch
    nc, h, lq = t.num_clips, t.hidden_size, cfg.data.max_q_l
    lv = nc * t.frame_stride

    ds = make_synthetic_dataset(
        cfg.data, n_videos=1, queries_per_video=16,
        ctx_l_range=(2240, 2245), dim=dim, q_len_range=(8, 20), seed=0)
    n_queries = len(ds)
    model, params = build_family(cfg, seed=0)
    pipe = make_pipeline(model, params, ds, cfg)
    pipe.run(host_postproc=False, fused=True)  # compile + stage corpus

    def timed(fn, *args, repeats=10):
        out = fn(*args)
        tunnel_sync(out)
        lat = sync_latency()
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        tunnel_sync(out)
        return max(time.perf_counter() - t0 - lat, 1e-9) / repeats

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    tok = jax.random.normal(ks[0], (b, lq, dim), jnp.float32)
    tmask = jnp.ones((b, lq), jnp.float32)
    mo = jax.random.normal(ks[1], (b, lv, dim), jnp.float32)
    ap = jax.random.normal(ks[2], (b, lv, dim), jnp.float32)
    cls = jax.random.normal(ks[3], (b, dim), jnp.float32)

    core = jax.jit(lambda p, tok, tm, mo: model.apply(
        {"params": p}, tok, tm, mo))
    scores, map_mask = core(params, tok, tmask, mo)

    fused_in = jax.random.normal(ks[4], (b, nc, nc, h), jnp.float32)
    map_fn = jax.jit(lambda p, x, m: model.apply(
        {"params": p}, x, m, method=lambda mdl, x, m: mdl.map_layer(x, m)))
    maph_in = jax.random.normal(ks[5], (b, nc, nc, h), jnp.float32)
    fusion_fn = jax.jit(lambda p, tok, tm, mh, m: model.apply(
        {"params": p}, tok, tm, mh, m,
        method=lambda mdl, tok, tm, mh, m: mdl.fusion_layer(tok, tm, mh, m)))
    frame_fn = jax.jit(lambda p, v: model.apply(
        {"params": p}, v,
        method=lambda mdl, v: mdl.prop_layer(mdl.frame_layer(v))))

    from cone_tpu.ops.nms import temporal_nms_device

    pool = 128
    pool_prob = jax.random.uniform(ks[6], (b, pool), jnp.float32)
    ps = jnp.tile(jnp.arange(pool, dtype=jnp.float32) % nc, (b, 1))
    pe = ps + 1 + jnp.arange(pool, dtype=jnp.float32) % 8
    spans = jnp.stack([ps, pe], axis=-1)
    nms_fn = jax.jit(lambda s, p: temporal_nms_device(
        s, p, p > 0, 0.3, t.proposal_top_k, hull_union=False))

    s_cell = jnp.tile(jnp.arange(t.proposal_top_k, dtype=jnp.int32), (b, 1))
    e_cell = s_cell + 3
    match_fn = jax.jit(lambda p, cls, ap, s, e: model.apply(
        {"params": p}, cls, ap, s, e,
        method=ConeTanModel.clip_matching_pred))

    fl = tan_flops_per_query(cfg)
    per_dispatch_q = qc
    dev_s_per_q, per_pass = device_time_fused(pipe, n_queries, repeats=5)
    n_disp = -(-n_queries // qc)
    full_ms = per_pass / n_disp * 1e3

    rows = []

    def row(name, sec, flops=0.0):
        rows.append((name, sec * 1e3, 100 * sec * 1e3 / full_ms,
                     flops / sec / 1e12 if flops else 0.0))

    row("full fused dispatch", per_pass / n_disp,
        fl["per_query"] * per_dispatch_q)
    row("  tan core (frame+prop+fusion+map+pred)",
        timed(core, params, tok, tmask, mo),
        (fl["per_query"] - fl["matching"]) / topk * b)
    row("    map-conv stack", timed(map_fn, params, fused_in, map_mask),
        fl["map_convs"] / topk * b)
    row("    fusion (LSTM + 1x1s + hadamard)",
        timed(fusion_fn, params, tok, tmask, maph_in, map_mask),
        fl["fusion"] / topk * b)
    row("    frame pool + sparse cascade", timed(frame_fn, params, mo),
        fl["frame"] / topk * b)
    row("  within-window NMS (pool=128 fori)", timed(nms_fn, spans, pool_prob))
    row("  matching branch", timed(match_fn, params, cls, ap, s_cell, e_cell),
        fl["matching"] / topk * b)

    # each conv layer in isolation: the MXU efficiency of the giant
    s_dim, c_in = nc, h
    for i, (c_out, k, p) in enumerate(zip(t.map_hidden_sizes,
                                          t.map_kernel_sizes,
                                          t.map_paddings)):
        x = jax.random.normal(ks[7], (b, s_dim, s_dim, c_in), jnp.float32)
        w = jax.random.normal(key, (k, k, c_in, c_out), jnp.float32) * 0.02
        conv = jax.jit(lambda x, w, p=p, k=k: jax.lax.conv_general_dilated(
            x, w, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        out_dim = s_dim + 2 * p - k + 1
        fl_layer = 2.0 * b * out_dim * out_dim * k * k * c_in * c_out
        row(f"  conv{i} {s_dim}->{out_dim} k{k}", timed(conv, x, w), fl_layer)
        s_dim, c_in = out_dim, c_out

    print(f"\nTAN fused dispatch = {qc} queries x {topk} windows "
          f"(B={b}), {fl['per_query'] / 1e12:.2f} TFLOP/query analytic")
    print(f"{'stage':<44}{'ms':>9}{'% pass':>9}{'TFLOP/s':>10}{'MFU%':>7}")
    for name, ms, pct, tfs in rows:
        mfu = f"{100 * tfs * 1e12 / PEAK_BF16:.1f}" if tfs else ""
        print(f"{name:<44}{ms:>9.2f}{pct:>8.1f}%"
              f"{tfs:>10.2f}{mfu:>7}")
    print(f"\nfull pass: {per_pass * 1e3:.1f} ms -> {1 / dev_s_per_q:.1f} q/s"
          f" | analytic MFU "
          f"{100 * fl['per_query'] / dev_s_per_q / PEAK_BF16:.1f}%")


if __name__ == "__main__":
    main()
