"""Decompose the fused serving program's device time by component.

The fine stage is ~100% of per-query FLOPs but only ~12% MFU; this tool
measures where the device time actually goes by timing sub-programs of one
(video, query-chunk) work item with the chained cheat-proof harness
(see tools/bench_coarse.py timeit docstring):

  coarse    adapter + frame scores + segment max + ranking
  gather    top-k window slicing / feature gather
  detr      the Moment-DETR forward (projections + encoder + decoder + heads)
  matching  proposal mean-pool + adapter + cosine matching branch
  nms       3-modality fusion + batched device NMS
  full      the whole fused_fn

    python tools/bench_fine_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain_time(fn, args, perturb_idx, iters=(50, 250)):
    """Chained device timing: perturb args[perturb_idx] (a small operand)
    with a value-neutral data-dependent vector; carry reduces every output
    element. Returns seconds/call from the two-point difference."""
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    def run(n):
        @jax.jit
        def chain(*a):
            def body(_, carry):
                a2 = list(a)
                p = a[perturb_idx]
                a2[perturb_idx] = p * (1.0 + carry * 1e-30)
                outs = fn(*a2)
                tot = jnp.float32(0)
                for o in jax.tree_util.tree_leaves(outs):
                    o = jnp.where(jnp.abs(o.astype(jnp.float32)) < 1e29,
                                  o.astype(jnp.float32), 0.0)
                    tot = tot + o.sum() * 1e-6
                return carry * 0.0 + tot
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros(a[perturb_idx].shape[-1], jnp.float32))

        tunnel_sync(chain(*args))
        lat = sync_latency()
        t0 = time.time()
        out = chain(*args)
        tunnel_sync(out)
        return time.time() - t0 - lat

    t1, t2 = run(iters[0]), run(iters[1])
    return (t2 - t1) / (iters[1] - iters[0])


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.data import make_synthetic_dataset
    from cone_tpu.eval.pipeline import InferencePipeline
    from cone_tpu.models.cone import ConeModel
    from cone_tpu.models.init import build_model_and_params
    from cone_tpu.ops.spans import span_cxw_to_xx
    from cone_tpu.ops.windows import slice_windows

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16"),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535,
                        topk_window=20, max_ctx_l=2304),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5, query_chunk=32,
                        video_batch=1),
    )
    ds = make_synthetic_dataset(cfg.data, n_videos=1, queries_per_video=32,
                                ctx_l_range=(2240, 2245), dim=dim,
                                q_len_range=(8, 20), seed=0)
    model, params = build_model_and_params(cfg.model, seed=0)
    pipe = InferencePipeline(model, params, ds, cfg)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    (group, inputs), = list(pipe._fused_groups())
    appear, a_scale, motion, m_scale, ctx, toks, tmask, clss = inputs
    # drop the video_batch=1 lane axis: sub-programs run unvmapped
    appear, a_scale = appear[0], a_scale[0]
    motion, m_scale = motion[0], m_scale[0]
    ctx_l = ctx[0]
    toks, tmask, clss = toks[0], tmask[0], clss[0]

    qc, k = cfg.eval.query_chunk, cfg.data.topk_window
    stride, max_v_l = pipe.stride, cfg.data.max_v_l

    # ---- staged intermediates (computed once, resident) ------------------
    adapted = pipe._adapt_fn(params, appear, a_scale)
    order, n_valid = pipe._coarse_fn(adapted, ctx_l, clss)
    win_idx = jnp.asarray(np.asarray(order)[:, :k])

    def gather_fn(appear, motion, win_idx):
        def slice_one(idx):
            a, m, s, l = slice_windows(appear, idx, stride, max_v_l, ctx_l)
            mo, _, _, _ = slice_windows(motion, idx, stride, max_v_l, ctx_l)
            return a, mo, m, s, l
        return jax.vmap(slice_one)(win_idx)

    ap, mo, wmask, wstart, wlen = jax.jit(gather_fn)(appear, motion, win_idx)
    flat = lambda x: x.reshape((qc * k,) + x.shape[2:])
    ap_f, mo_f, wmask_f = flat(ap), flat(mo), flat(wmask)
    rep = lambda x: jnp.repeat(x, k, axis=0)
    tok_f, tmask_f, cls_f = rep(toks), rep(tmask), rep(clss)

    def detr_fn(params, tok, tmask, mo, wmask):
        out = model.apply({"params": params}, tok, tmask, mo, wmask,
                          deterministic=True)
        return out["pred_spans"], out["pred_logits"]

    spans, logits = jax.jit(detr_fn)(params, tok_f, tmask_f, mo_f, wmask_f)

    def matching_fn(params, cls, ap, wmask, spans):
        return model.apply({"params": params}, cls, ap, wmask, spans,
                           method=ConeModel.clip_matching_pred)

    def nms_fn(spans, logits, match, wstart, wlen):
        from cone_tpu.ops.nms import temporal_nms_device
        prob = jax.nn.softmax(logits, axis=-1)[..., 0]
        xx = span_cxw_to_xx(spans)
        sec = (xx * wlen.reshape(-1)[:, None, None]
               + wstart.reshape(-1)[:, None, None]) * cfg.data.clip_length
        nq = prob.shape[-1]
        sp = sec.reshape(qc, k * nq, 2)
        pr = prob.reshape(qc, k * nq)
        ma = match.reshape(qc, k * nq)
        valid = jnp.ones((qc, k * nq), bool)
        sc3 = jnp.stack([pr + ma, pr, ma])
        sp3 = jnp.broadcast_to(sp, (3,) + sp.shape)
        v3 = jnp.broadcast_to(valid, (3,) + valid.shape)
        return temporal_nms_device(sp3, sc3, v3, cfg.eval.nms_thd,
                                   cfg.eval.max_after_nms)

    match = jax.jit(matching_fn)(params, cls_f, ap_f, wmask_f, spans)

    def coarse_stage(adapted, clss, ctx_l):
        return pipe._coarse_fn(adapted, ctx_l, clss)

    def full_fn(params, appear, a_scale, motion, m_scale, ctx_l,
                toks, tmask, clss):
        return pipe._fused_fn(params, appear, a_scale, motion, m_scale,
                              ctx_l, toks, tmask, clss)

    parts = {
        "coarse": (lambda a, c: coarse_stage(a, c, ctx_l), (adapted, clss), 1),
        "gather": (gather_fn, (appear, motion, win_idx), 0),
        "detr": (lambda t, tm, m, wm: detr_fn(params, t, tm, m, wm),
                 (tok_f, tmask_f, mo_f, wmask_f), 0),
        "matching": (lambda c, a, wm, s: matching_fn(params, c, a, wm, s),
                     (cls_f, ap_f, wmask_f, spans), 0),
        "nms": (nms_fn, (spans, logits, match, wstart, wlen), 2),
        "full": (lambda ap_, cl_: full_fn(params, ap_, a_scale, motion,
                                          m_scale, ctx_l, toks, tmask, cl_),
                 (appear, clss), 1),
    }
    # Two-point chained timing resolves ~0.1 ms at these iteration counts
    # (round-trip noise / 200 iters); parts cheaper than that (coarse,
    # matching — tens of us) clamp to 0 and are reported as below
    # resolution rather than as noise-negative values.
    RESOLUTION_US = 100.0
    results = {}
    for name, (fn, args, pidx) in parts.items():
        dt = max(chain_time(fn, args, pidx), 0.0)
        results[name] = round(dt * 1e6, 1)
        if dt * 1e6 < RESOLUTION_US:
            print(f"{name:9s}: < {RESOLUTION_US:.0f} us (below resolution)",
                  file=sys.stderr)
        else:
            print(f"{name:9s}: {dt * 1e6:8.1f} us per (video x {qc}-query"
                  f" chunk) -> {qc / dt:8.1f} q/s", file=sys.stderr)

    import json
    print(json.dumps({"metric": "fine_breakdown_us", "value": results["full"],
                      "unit": "us/chunk", "parts": results}))


if __name__ == "__main__":
    main()
