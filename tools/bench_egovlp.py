"""EgoVLP video-tower extraction throughput on TPU.

The reference extracts EgoVLP clip features on GPU in batches of 4 clips
(run_on_video/egovlp_extrator.py:120-135). Here the tower is flax
(models/egovlp.py, parity-tested) and jit-compiles onto the TPU; this tool
measures clips/sec over a batch-size sweep, fp32 vs bf16, and converts to
video-minutes-per-second at the Ego4D rate (1.875 fps, 4 frames/clip ->
one clip covers 2.133 s of video).

    python tools/bench_egovlp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def vit_flops_per_clip(cfg):
    """Approximate matmul FLOPs (2*m*n*k) for one 4-frame clip through the
    divided space-time ViT: patch embed + per layer (temporal attn over F,
    spatial attn over N, qkv/proj, MLP) + projection."""
    f, n, d = cfg.num_frames, (cfg.img_size // cfg.patch_size) ** 2, cfg.embed_dim
    s = f * n + 1
    patch = 2 * f * n * (cfg.patch_size**2 * 3) * d
    qkvproj = 4 * 2 * s * d * d
    attn_t = 4 * n * f * f * d          # temporal: N groups of FxF
    attn_s = 4 * f * n * n * d          # spatial: F groups of NxN
    mlp = 2 * 2 * s * d * int(d * cfg.mlp_ratio)
    proj = 2 * d * cfg.projection_dim
    return patch + cfg.depth * (qkvproj + attn_t + attn_s + mlp) + proj


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    from cone_tpu.models.egovlp import EgoVlpConfig, EgoVlpVideoTower

    cfg = EgoVlpConfig()
    model = EgoVlpVideoTower(cfg)
    rng = np.random.default_rng(0)
    frames = rng.standard_normal(
        (32, cfg.num_frames, cfg.img_size, cfg.img_size, 3), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames[:1]))["params"]
    flops = vit_flops_per_clip(cfg)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"ViT-B/{cfg.patch_size} x {cfg.num_frames} frames:"
          f" {flops / 1e9:.1f} GFLOP/clip", file=sys.stderr)

    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    results = {}
    for dtype in ("float32", "bfloat16"):
        cast = (lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)) \
            if dtype == "bfloat16" else (lambda t: t)
        p = cast(params)

        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
        for bsz in (4, 8, 16, 32):
            x = jnp.asarray(frames[:bsz]) if dtype == "float32" else \
                jnp.asarray(frames[:bsz], jnp.bfloat16)
            tunnel_sync(fwd(p, x))  # compile; real fence (utils/perf.py)
            lat = sync_latency()
            n_iter = 10
            t0 = time.perf_counter()
            out = None
            for _ in range(n_iter):
                out = fwd(p, x)
            tunnel_sync(out)
            dt = (time.perf_counter() - t0 - lat) / n_iter
            cps = bsz / dt
            tflops = flops * cps / 1e12
            results[f"{dtype}_b{bsz}"] = round(cps, 1)
            print(f"{dtype:9s} bsz {bsz:2d}: {cps:7.1f} clips/s"
                  f" = {cps * 2.1333 / 60:6.2f} video-min/s"
                  f" | {tflops:6.1f} TFLOP/s", file=sys.stderr)

    import json

    best = max(results.values())
    print(json.dumps({
        "metric": "egovlp_extract_clips_per_s", "value": best,
        "unit": "clips/sec", "gflop_per_clip": round(flops / 1e9, 1),
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
