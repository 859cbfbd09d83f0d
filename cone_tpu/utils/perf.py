"""Analytic FLOPs / HBM models and device-time measurement for the serving
pipeline.

The reference's only runtime instrumentation is a wall-clock print
(cone/inference.py:317). Here we account for where the time goes:

  * `cone_flops_per_query` — analytic matmul FLOPs of the coarse + fine
    stages per query (2*m*n*k per matmul, from the model config);
  * `device_time_fused` — device-only seconds per query: all fused-program
    inputs pre-staged in HBM, `repeats` full passes dispatched back-to-back,
    one block at the end. Dispatch latency overlaps, so this isolates the
    device from the host/tunnel round-trips that dominate single-chip
    wall-clock;
  * MFU/HBM utilization vs chip peaks (v5e: 197 bf16 TFLOP/s, 819 GB/s).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

# TPU v5e (v5 lite) peaks; see cloud.google.com/tpu/docs/v5e ("197 TFLOPS
# bf16", "819 GBps HBM BW" per chip). Other chips can be added as needed.
CHIP_PEAKS = {
    "v5e": dict(flops_bf16=197e12, flops_f32=49e12, hbm_gbps=819.0),
}


@dataclass
class FlopsBreakdown:
    coarse_per_query: float      # frame-score matmul + window max
    fine_per_query: float        # topk-window batched forward + matching
    adapt_per_video: float       # coarse adapter transform, once per video
    bytes_per_query: float       # HBM traffic lower bound (feature reads)

    @property
    def per_query(self) -> float:
        return self.coarse_per_query + self.fine_per_query


def _window_forward_flops(m) -> dict:
    """Matmul FLOPs (2*m*n*k) of ONE window forward through the model, by
    part. m: ModelConfig."""
    d, f, nq = m.hidden_dim, m.dim_feedforward, m.num_queries
    dv, dt, da = m.v_motion_feat_dim, m.t_feat_dim, m.v_appear_feat_dim
    lv, lq = m.max_v_l, m.max_q_l
    L = lv + lq

    proj = 2 * lv * (dv * d + d * d) + 2 * lq * (dt * d + d * d)
    enc_layer = 8 * L * d * d + 4 * L * L * d + 4 * L * d * f
    dec_layer = (
        (8 * nq * d * d + 4 * nq * nq * d)          # query self-attn
        + (4 * nq * d * d + 4 * L * d * d + 4 * nq * L * d)  # cross-attn
        + 4 * nq * d * f                             # FFN
    )
    heads = m.dec_layers * (2 * nq * d * 2 + 3 * 2 * nq * d * d) + 2 * lv * d
    # matching branch: masked segment-mean pool + residual adapter MLP +
    # cosine vs text CLS
    matching = 2 * nq * (da * d + d * da) + lv * da + 2 * nq * da
    core = proj + m.enc_layers * enc_layer + m.dec_layers * dec_layer + heads
    return {"core": float(core), "matching": float(matching)}


def cone_flops_per_query(cfg, ctx_pad: int) -> FlopsBreakdown:
    """Matmul FLOPs (2*m*n*k) per query through the fused pipeline.

    cfg: ConeConfig. ctx_pad: padded video length the coarse stage runs at
    (a ctx bucket or data.max_ctx_l).
    """
    m = cfg.model
    da = m.v_appear_feat_dim
    d = m.hidden_dim
    lv = m.max_v_l
    dv = m.v_motion_feat_dim
    topk = cfg.data.topk_window
    qc = max(1, cfg.eval.query_chunk)

    w = _window_forward_flops(m)
    per_window = w["core"] + w["matching"]
    fine = topk * per_window

    # --- coarse stage ------------------------------------------------------
    coarse = 2 * ctx_pad * da + 2 * ctx_pad          # matvec + segment max
    adapt_video = 2 * ctx_pad * (da * d + d * da)    # adapter, per video

    # --- HBM lower bound ----------------------------------------------------
    # coarse reads the adapted features once per query chunk; fine gathers
    # topk windows of both feature streams, at the HBM-resident corpus dtype
    # (eval.corpus_dtype: fp32 / bf16 / int8 + per-frame fp32 scales)
    corpus_dt = getattr(cfg.eval, "corpus_dtype", "float32")
    isz = {"float32": 4, "bfloat16": 2, "int8": 1}[corpus_dt]
    scale_b = 4 if corpus_dt == "int8" else 0  # (L, 1) fp32 scale rows
    bytes_q = ((ctx_pad * (da * isz + scale_b)) / qc
               + topk * lv * ((dv + da) * isz + 2 * scale_b))
    return FlopsBreakdown(
        coarse_per_query=float(coarse),
        fine_per_query=float(fine),
        adapt_per_video=float(adapt_video),
        bytes_per_query=float(bytes_q),
    )


def tan_flops_per_query(cfg) -> dict:
    """Analytic matmul FLOPs (2*m*n*k) per query through the fused
    CONE-TAN pipeline (eval/tan_pipeline.py), by part.

    The 2D-TAN head (cone_2dtan/lib/models/map_modules/map_conv.py:6) is
    ~2-3 orders of magnitude more FLOPs per query than the Moment-DETR
    head: every one of the topk windows pushes the fused (S, E, C) map
    through `len(map_hidden_sizes)` KxK conv layers. With the canonical
    K9L4 geometry and paddings (16, 0, 0, 0) the map grows 64->88 then
    shrinks back (88/80/72/64), so the conv stack alone is ~249 GFLOP per
    window. Everything else (frame 1x1 conv, LSTM text encoder, fusion
    1x1 conv, pred head, matching adapter) is reported too but is <1%.
    """
    m, t = cfg.model, cfg.tan
    h = t.hidden_size
    nc = t.num_clips
    lv = nc * t.frame_stride            # raw window clips (= data.max_v_l)
    lq = cfg.data.max_q_l
    dv, dt, da = t.v_feat_dim, t.t_feat_dim, m.v_appear_feat_dim
    topk = cfg.data.topk_window
    top_p = t.proposal_top_k

    # per-window parts -----------------------------------------------------
    frame = 2 * lv * dv * h                             # 1x1 conv (Dense)
    # sparse max-pool cascade: no matmuls (reduce_window); sparse_conv
    # variant: Conv1d stages over the shrinking sequence
    prop = 0.0
    if t.prop_module == "sparse_conv":
        from cone_tpu.models.tan import sparse_map_layout

        length = nc
        for _, _, k, s, pool_ok, _, _ in sparse_map_layout(
                nc, tuple(t.num_scale_layers)):
            if pool_ok:
                out_l = (length - k) // s + 1
                prop += 2 * out_l * k * h * h
                length = out_l
    # LSTM: 4 gates, input + recurrent GEMMs per step per layer, at the
    # TEXT hidden width (BaseFusion builds LstmTextEncoder(txt_hidden_size),
    # models/tan.py:238; tex_linear then maps th -> h). The fused fn
    # repeats the query per window, so this runs per (query, window).
    th = t.txt_hidden_size
    lstm0 = 2 * lq * (dt * 4 * th + th * 4 * th)
    lstm_rest = (t.lstm_layers - 1) * 2 * lq * (th * 4 * th + th * 4 * th)
    tex = 2 * th * h
    fusion = lstm0 + lstm_rest + tex + 2 * nc * nc * h * h  # + vis 1x1 conv

    # mask-renormalized KxK conv stack; the ones-kernel count conv is
    # 1-channel (2*S^2*k^2 ~ 1e6) — folded into `map_convs`
    map_convs = 0.0
    s_dim = nc
    c_in = h
    for c_out, k, p in zip(t.map_hidden_sizes, t.map_kernel_sizes,
                           t.map_paddings):
        s_dim = s_dim + 2 * p - k + 1
        map_convs += 2 * s_dim * s_dim * k * k * c_in * c_out
        map_convs += 2 * s_dim * s_dim * k * k          # count conv
        c_in = c_out
    pred = 2 * s_dim * s_dim * c_in                      # 1-channel head
    # matching branch: segment-mean pool + residual adapter MLP + cosine,
    # per kept proposal
    matching = top_p * (lv * da + 2 * (da * h + h * da) + 2 * da)

    per_window = frame + prop + fusion + map_convs + pred + matching
    parts = {
        "map_convs": topk * map_convs,
        "fusion": topk * fusion,
        "frame": topk * (frame + prop),
        "pred": topk * pred,
        "matching": topk * matching,
    }
    parts["per_query"] = float(topk * per_window)
    return parts


def tan_perf_report(cfg, device_s_per_query: float, chip: str = "v5e") -> dict:
    """MFU of the fused TAN serving pass. fp32 params, but this build's
    default-low matmul precision executes convs as bf16 MXU passes
    (tools/bench_int8.py), so bf16 peak is the honest denominator."""
    peaks = CHIP_PEAKS[chip]
    parts = tan_flops_per_query(cfg)
    device_qps = 1.0 / device_s_per_query
    return {
        "tan_flops_per_query": parts["per_query"],
        "tan_device_qps": round(device_qps, 2),
        "tan_mfu": round(parts["per_query"] * device_qps
                         / peaks["flops_bf16"], 4),
        "tan_map_conv_frac": round(parts["map_convs"] / parts["per_query"], 4),
        "chip": chip,
    }


def cone_train_flops_per_sample(cfg, adapter_on: bool = True) -> float:
    """Analytic matmul FLOPs of ONE training-step sample (fwd + bwd + opt).

    One step per sample runs: the positive-window forward, the
    negative-window forward (loss.neg_loss, cone/train.py:60-64), and the
    GT-proposal matching forward when the adapter gate is open
    (cone/train.py:73-78). Backward costs ~2x the forward's matmul FLOPs
    (one pass for activation grads, one for weight grads), so the step is
    ~3x the total forward. The AdamW update and the criterion itself are
    element-wise (O(params), no matmuls) — real but negligible next to the
    transformer, so not modeled.
    """
    m = cfg.model
    w = _window_forward_flops(m)
    fwd = w["core"]                      # positive window
    if cfg.loss.neg_loss:
        fwd += w["core"]                 # negative window, full forward
    if adapter_on and cfg.loss.adapter_loss:
        # clip_matching_gt: GT-proposal segment-mean + adapter MLP +
        # (B, B) NCE logits — per sample: pool + MLP + one row of logits
        d = m.hidden_dim
        da = m.v_appear_feat_dim
        bsz = cfg.train.bsz
        fwd += m.max_v_l * da + 2 * (da * d + d * da) + 2 * bsz * da
    return 3.0 * fwd


def train_perf_report(cfg, samples_per_sec: float, chip: str = "v5e",
                      adapter_on: bool = True) -> dict:
    """MFU of the training step, mirroring perf_report for inference."""
    peaks = CHIP_PEAKS[chip]
    peak = (
        peaks["flops_bf16"] if cfg.model.compute_dtype == "bfloat16"
        else peaks["flops_f32"]
    )
    fps = cone_train_flops_per_sample(cfg, adapter_on=adapter_on)
    return {
        "flops_per_sample": fps,
        "train_samples_per_sec": round(samples_per_sec, 1),
        "train_mfu": round(fps * samples_per_sec / peak, 4),
        "chip": chip,
    }


def tunnel_sync(x) -> None:
    """Reliable execution fence: fetch one scalar of `x` to host.

    On the tunneled PJRT backend `jax.block_until_ready` can return long
    before remote execution finishes (measured: a chained 50x 8192^3
    matmul program "blocks" in 0.1 ms but needs 348 ms to produce data —
    663 PFLOP/s if believed). The device executes in launch order, so a
    tiny gather enqueued after everything else + `device_get` is a true
    fence. ALWAYS use this (not block_until_ready) to close a timed
    region; subtract `sync_latency()` (the tunnel round trip, ~10-80 ms)
    from the measurement.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf.ravel()[0])


def sync_latency(trials: int = 3) -> float:
    """Measured cost of `tunnel_sync` on an already-resident array."""
    import jax.numpy as jnp

    a = jnp.zeros((8,), jnp.float32)
    tunnel_sync(a)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        tunnel_sync(a)
        best = min(best, time.perf_counter() - t0)
    return best


def device_time_fused(pipe, n_queries: int, repeats: int = 5):
    """Device-only seconds/query for the fused pipeline.

    Stages every dispatch's inputs in HBM first, then issues
    `repeats` x all-groups dispatches back-to-back and fences once with
    `tunnel_sync` (minus the measured fetch latency).
    Returns (sec_per_query, sec_per_pass).
    """
    staged = [(g, inp) for g, inp in pipe._fused_groups()]
    # warmup (compile every bucket shape) + ensure inputs resident
    outs = [pipe._fused_batch_fn(pipe.params, *inp) for _, inp in staged]
    tunnel_sync(outs[-1])
    lat = sync_latency()

    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        for _, inp in staged:
            out = pipe._fused_batch_fn(pipe.params, *inp)
    tunnel_sync(out)
    dt = max(time.perf_counter() - t0 - lat, 1e-9)
    per_pass = dt / repeats
    return per_pass / n_queries, per_pass


def perf_report(cfg, ctx_pad: int, n_queries: int, device_s_per_query: float,
                wall_qps: float, chip: str = "v5e") -> dict:
    """Assemble the instrumented numbers into one dict for the bench JSON."""
    peaks = CHIP_PEAKS[chip]
    fb = cone_flops_per_query(cfg, ctx_pad)
    peak = (
        peaks["flops_bf16"] if cfg.model.compute_dtype == "bfloat16"
        else peaks["flops_f32"]
    )
    device_qps = 1.0 / device_s_per_query
    achieved_flops = fb.per_query * device_qps
    achieved_gbps = fb.bytes_per_query * device_qps / 1e9
    return {
        "flops_per_query": fb.per_query,
        "flops_fine_frac": fb.fine_per_query / fb.per_query,
        "bytes_per_query": fb.bytes_per_query,
        "device_qps": round(device_qps, 2),
        "wall_qps": round(wall_qps, 2),
        "mfu": round(achieved_flops / peak, 4),
        "hbm_util": round(achieved_gbps / peaks["hbm_gbps"], 4),
        "chip": chip,
    }
