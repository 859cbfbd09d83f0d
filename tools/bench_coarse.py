"""Microbench: Pallas fused coarse kernel vs the XLA matmul+reduce path,
MAD-scale (2h movie @ 5 fps, 512-d CLIP features). Run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cone_tpu.ops.pallas_coarse import coarse_segment_max
from cone_tpu.ops.windows import window_scores_from_frame_scores


def timeit(fn, feats, cls, ctx, iters=(100, 300)):
    """Per-call device time for a sub-ms kernel, compiler-cheat-proof.

    Sub-ms kernels can't be resolved by N dispatches + one fence: the
    execution hides inside the ~34 ms tunnel round-trip noise. All
    iterations therefore chain inside ONE program — and the chain must be
    built so XLA cannot shortcut it (every naive variant was measurably
    exploited on this workload):

      * perturbing `feats` (the big operand): the add can't fuse into a
        pallas_call, charging the Pallas path an extra 2x74 MB pass;
      * a scalar perturbation of `cls`: hoisted — (c+s)@F^T rewrites to
        c@F^T + s*(1@F^T), and the 74 MB matmul leaves the loop
        ("measured" 1871 GB/s, 2.3x above HBM peak);
      * carrying only out[0]: dead-code eliminates 31/32 output rows.

    The cheat-proof chain: perturb cls with a per-COLUMN (d,) vector
    (C*diag(v) @ F^T has no rewrite that avoids re-reading F) built from
    a reduction over EVERY output element (no row/col DCE), scaled by
    1e-30 (exact identity in fp32 — results are bit-identical). Per-call
    time = (t_iters2 - t_iters1) / (iters2 - iters1), cancelling the
    round trip and any loop-invariant prologue.
    """
    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    d = feats.shape[1]

    def chain_time(n):
        @jax.jit
        def chain(f, c, x):
            def body(_, carry):
                v = 1.0 + carry * 1e-30
                out = fn(f, c * v[None, :], x)
                w = jnp.where(out > -1e29, out, 0.0)
                return w.sum(axis=0)[:d] + w.sum() * 1e-6
            return jax.lax.fori_loop(0, n, body, jnp.zeros((d,), jnp.float32))

        tunnel_sync(chain(feats, cls, ctx))  # compile (real fence)
        lat = sync_latency()
        t0 = time.time()
        out = chain(feats, cls, ctx)
        tunnel_sync(out)
        return time.time() - t0 - lat

    t1, t2 = chain_time(iters[0]), chain_time(iters[1])
    return (t2 - t1) / (iters[1] - iters[0])


def main():
    stride, max_v_l = 62, 125  # MAD
    ctx_l = 36000              # 2 h @ 5 fps
    d, q = 512, 32
    n_seg = -(-ctx_l // stride) + 1
    l_pad = n_seg * stride
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(l_pad, d)).astype(np.float32))
    cls = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))
    ctx = jnp.asarray(ctx_l, jnp.int32)
    max_w = n_seg + 1

    @jax.jit
    def xla_path(feats, cls, ctx):
        frame = cls @ feats.T
        return jax.vmap(
            lambda fs: window_scores_from_frame_scores(fs, ctx, stride, max_w)[0]
        )(frame)

    @jax.jit
    def pallas_path(feats, cls, ctx):
        return coarse_segment_max(feats, cls, ctx, stride)

    t_x = timeit(xla_path, feats, cls, ctx)
    t_p = timeit(pallas_path, feats, cls, ctx)
    hbm_gb = l_pad * d * 4 / 1e9
    print(f"video: {ctx_l} frames x {d}d = {hbm_gb*1e3:.1f} MB, {q} queries")
    print(f"XLA   matmul+reduce: {t_x*1e3:.3f} ms  ({hbm_gb/t_x:.0f} GB/s)")
    print(f"Pallas fused       : {t_p*1e3:.3f} ms  ({hbm_gb/t_p:.0f} GB/s)")
    print(f"speedup: {t_x/t_p:.2f}x")

    # correctness on-device
    seg = pallas_path(feats, cls, ctx)
    from cone_tpu.ops.pallas_coarse import window_scores_from_segment_max

    got, _ = window_scores_from_segment_max(seg, ctx, stride, max_w)
    want = xla_path(feats, cls, ctx)
    nw = -(-ctx_l // stride) + 1
    err = np.abs(np.asarray(got)[:, :nw] - np.asarray(want)[:, :nw]).max()
    print(f"max abs diff vs XLA path: {err:.2e}")


if __name__ == "__main__":
    main()
