"""Is 23-24% serving MFU the floor for the reference geometry? Measure the
fused fine forward against its own matmul speed-of-light.

Method: enumerate every GEMM the per-window DETR forward performs at the
bench.py serving geometry (qc=16 x topk=20 = 320 windows/dispatch, L=112
padded seq, d=256, nheads=8 -> d_head=32, ffn 1024, nq=5, bf16) and time
each shape CHAINED inside one jitted program — a lax.scan whose carry
feeds a scalar derived from each product back into the next iteration's
lhs, so XLA can neither hoist the matmul out of the loop nor DCE it, and
the tunnel's per-dispatch overhead (10-80 ms, larger than most of these
GEMMs' entire device time) amortizes over the chain. (A first version
timed each GEMM as a standalone dispatch; its "speed-of-light sum" came
out 4.5x SLOWER than the real fused forward — pure enqueue overhead.)
The sum of the chained times is the fastest any schedule could run the
same matmul content with zero fusion wins, zero overhead of
softmax/masking/layernorm/gather/NMS. Comparing it with the measured full
model forward (and the full fused dispatch) separates:

  * MXU-shape inefficiency (each GEMM's own achieved TFLOP/s — d_head-32
    attention contractions fill 25% of the MXU's K=128 systolic depth;
    L=112 fills 7/8 sublanes) — unfixable without changing the model
    (converted reference checkpoints pin nheads=8 / d=256);
  * schedule overhead (everything the fused program does beyond matmuls:
    softmax, masks, layernorms, residuals, gathers, NMS).

Numbers feed the serving-MFU floor paragraph in docs/RESULTS.md.
Reference geometry: cone/model.py (Moment-DETR head), serving shapes from
bench.py.

    python tools/bench_serving_floor.py       # no JAX_PLATFORMS override
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from cone_tpu.utils.perf import CHIP_PEAKS

PEAK_BF16 = CHIP_PEAKS["v5e"]["flops_bf16"]


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir
    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    print(f"devices: {jax.devices()}", file=sys.stderr)

    B = 320          # windows per dispatch (qc=16 x topk=20)
    L, D, H, F, NQ = 112, 256, 8, 1024, 5
    HD = D // H
    LV, LQ = 90, 20
    rng = np.random.default_rng(0)

    # (name, count, batch, m, k, n): `count` identical GEMMs per dispatch
    gemms = [
        ("input proj vid (x2 layers)", 2, 1, B * LV, D, D),
        ("input proj txt (x2 layers)", 2, 1, B * LQ, D, D),
        ("enc qkv packed (x2)",        2, 1, B * L, D, 3 * D),
        ("enc attn scores QK^T (x2)",  2, B * H, L, HD, L),
        ("enc attn apply PV (x2)",     2, B * H, L, L, HD),
        ("enc out proj (x2)",          2, 1, B * L, D, D),
        ("enc ffn in (x2)",            2, 1, B * L, D, F),
        ("enc ffn out (x2)",           2, 1, B * L, F, D),
        ("dec self qkv+out (x2)",      2, 1, B * NQ, D, 4 * D),
        ("dec cross q (x2)",           2, 1, B * NQ, D, D),
        ("dec cross kv (x2)",          2, 1, B * L, D, 2 * D),
        ("dec cross scores (x2)",      2, B * H, NQ, HD, L),
        ("dec cross apply (x2)",       2, B * H, NQ, L, HD),
        ("dec out+ffn (x2)",           2, 1, B * NQ, D, D + 2 * F),
        ("span/class heads",           1, 1, B * NQ, D, 3 * D),
    ]

    def timed(fn, *args, n=30):
        out = fn(*args)
        tunnel_sync(out)
        lat = sync_latency()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        tunnel_sync(out)
        return max(time.perf_counter() - t0 - lat, 1e-9) / n

    def chain_time(a, b, matmul, fl):
        """Device seconds per GEMM: data-dependent repeats in ONE program.

        Cheat-proofing (same traps tools/bench_coarse.py documents):
        the product is consumed through `max(c)` — non-linear, so the
        simplifier can neither narrow the dot to one output element nor
        factor `reduce(dot)` into reduced operands — and the loop carry
        perturbs ONE element of the rhs by that max (in-place scatter on
        the donated carry; not distributable out of the dot). Chain
        length adapts so each run is ~0.15 s of estimated device time,
        amortizing the tunnel's 10-80 ms dispatch+fence cost; subtracting
        a quarter-length run cancels what overhead remains.
        """
        def body(carry_b, _):
            c = matmul(a, carry_b)
            eps = (jnp.max(c).astype(jnp.float32) * 1e-20)
            return carry_b.at[(0,) * carry_b.ndim].add(
                eps.astype(carry_b.dtype)), ()

        def run(r):
            f = jax.jit(
                lambda b: jax.lax.scan(body, b, None, length=r)[0],
                donate_argnums=0)
            out = f(jnp.array(b))  # copy: each call donates its input
            tunnel_sync(out)
            best = float("inf")
            for _ in range(3):
                bb = jnp.array(b)  # donated each call
                t0 = time.perf_counter()
                out = f(bb)
                tunnel_sync(out)
                best = min(best, time.perf_counter() - t0)
            return best

        est = fl / (0.3 * PEAK_BF16)          # s/step if ~30% MFU
        R = int(min(max(0.15 / est, 400), 40000))
        return max(run(R) - run(R // 4), 1e-9) / (R - R // 4)

    def shape_ceiling(m, k, n):
        """MXU fill ceiling from shape alone: the 128x128 systolic array
        contracts 128 deep (k) and emits 128 lanes (n); any dim pads to the
        next multiple of 128 (k=160 fills 160/256, not 1.0). m only pays
        sublane padding to 8."""
        u_k = k / (-(-k // 128) * 128)
        u_n = n / (-(-n // 128) * 128)
        u_m = m / (-(-m // 8) * 8)
        return u_k * u_n * u_m

    total_sol, total_flops, total_ceiling_t = 0.0, 0.0, 0.0
    print(f"{'GEMM':<30}{'shape':>24}{'us':>8}{'TFLOP/s':>9}"
          f"{'MFU%':>6}{'ceil%':>6}")
    for name, count, bt, m, k, n in gemms:
        if bt == 1:
            a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
            b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
            mm = lambda x, y: x @ y
        else:
            a = jnp.asarray(rng.normal(size=(bt, m, k)), jnp.bfloat16)
            b = jnp.asarray(rng.normal(size=(bt, k, n)), jnp.bfloat16)
            mm = lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y)
        fl = 2.0 * bt * m * k * n
        t = chain_time(a, b, mm, fl)
        ceil = shape_ceiling(m, k, n)
        total_sol += count * t
        total_flops += count * fl
        total_ceiling_t += count * fl / (ceil * PEAK_BF16)
        shape = f"{bt}x({m}x{k}x{n})" if bt > 1 else f"{m}x{k}x{n}"
        print(f"{name:<30}{shape:>24}{t * 1e6:>8.1f}"
              f"{fl / t / 1e12:>9.2f}{100 * fl / t / PEAK_BF16:>6.1f}"
              f"{100 * ceil:>6.1f}")

    print(f"\nmatmul content: {total_flops / 1e9:.2f} GFLOP/dispatch, "
          f"speed-of-light sum {total_sol * 1e3:.3f} ms "
          f"({100 * total_flops / total_sol / PEAK_BF16:.1f}% MFU at zero"
          f" overhead)")
    print(f"shape-ceiling sum (analytic MXU fill): "
          f"{total_ceiling_t * 1e3:.3f} ms "
          f"({100 * total_flops / total_ceiling_t / PEAK_BF16:.1f}% MFU)")

    # the real forward at the same geometry (batched windows, bf16)
    import dataclasses as dc

    from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
    from cone_tpu.models.init import build_model_and_params

    dim = 256
    cfg = ConeConfig(
        model=ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                          v_appear_feat_dim=dim, max_v_l=90, max_q_l=20,
                          compute_dtype="bfloat16", seq_pad_multiple=16),
        data=DataConfig(max_v_l=90, max_q_l=20, clip_length=0.535,
                        topk_window=20, max_ctx_l=2304),
    )
    model, params = build_model_and_params(cfg.model, seed=0)
    tok = jnp.asarray(rng.normal(size=(B, LQ, dim)), jnp.float32)
    tmask = jnp.ones((B, LQ), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, LV, dim)), jnp.float32)
    vmask = jnp.ones((B, LV), jnp.float32)
    fwd = jax.jit(lambda p, tok, tm, v, vm: model.apply(
        {"params": p}, tok, tm, v, vm, deterministic=True))
    t_fwd = timed(fwd, params, tok, tmask, vid, vmask, n=20)
    print(f"full model forward ({B} windows): {t_fwd * 1e3:.3f} ms"
          f" = {t_fwd / total_sol:.2f}x its matmul speed-of-light"
          f" | fwd-only MFU {100 * total_flops / t_fwd / PEAK_BF16:.1f}%")


if __name__ == "__main__":
    main()
