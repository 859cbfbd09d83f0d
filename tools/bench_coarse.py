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


def timeit(fn, *args, iters=20):
    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    tunnel_sync(fn(*args))
    lat = sync_latency()
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    tunnel_sync(out)  # block_until_ready is a no-op fence on the tunnel
    return (time.time() - t0 - lat) / iters


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
