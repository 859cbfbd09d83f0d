"""CLIP tower extraction throughput on TPU (flax, models/clip.py).

The reference extracts MAD features with torch CLIP on GPU in batches of 60
frames (feature_extraction/clip_extractor.py:22-36). Here both towers are
flax and jit onto the TPU; this tool measures the vision tower in
frames/sec over a batch sweep (fp32 vs bf16) and the text tower in
queries/sec at the fixed 77-token context, at the real ViT-B/32 geometry
(random weights — the released checkpoint only changes the values, not the
program).

    python tools/bench_clip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def vision_flops_per_frame(c):
    n = (c.image_size // c.patch_size) ** 2
    s = n + 1
    d = c.hidden_size
    patch = 2 * n * (c.patch_size**2 * 3) * d
    qkvproj = 4 * 2 * s * d * d
    attn = 4 * s * s * d
    mlp = 2 * 2 * s * d * c.intermediate_size
    proj = 2 * d * c.projection_dim
    return patch + c.num_layers * (qkvproj + attn + mlp) + proj


def text_flops_per_query(c):
    s = c.context_length
    d = c.hidden_size
    qkvproj = 4 * 2 * s * d * d
    attn = 4 * s * s * d
    mlp = 2 * 2 * s * d * c.intermediate_size
    return c.num_layers * (qkvproj + attn + mlp) + 2 * d * c.projection_dim


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    from cone_tpu.models.clip import (ClipTextConfig, ClipTextTower,
                                      ClipVisionConfig, ClipVisionTower)
    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = {}

    vc = ClipVisionConfig()  # ViT-B/32, proj 512 — the MAD feature model
    vt = ClipVisionTower(vc)
    vflops = vision_flops_per_frame(vc)
    pixels = rng.standard_normal(
        (256, vc.image_size, vc.image_size, 3)).astype(np.float32)
    vparams = vt.init(jax.random.PRNGKey(0), jnp.asarray(pixels[:1]))["params"]
    print(f"vision ViT-B/{vc.patch_size}: {vflops / 1e9:.1f} GFLOP/frame",
          file=sys.stderr)
    for dtype in ("float32", "bfloat16"):
        jd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        p = jax.tree.map(lambda x: x.astype(jd), vparams)
        fwd = jax.jit(lambda p, x: vt.apply({"params": p}, x))
        for bsz in (32, 64, 128, 256):
            x = jnp.asarray(pixels[:bsz], jd)
            tunnel_sync(fwd(p, x))
            lat = sync_latency()
            n_iter = 10
            t0 = time.perf_counter()
            out = None
            for _ in range(n_iter):
                out = fwd(p, x)
            tunnel_sync(out)
            dt = (time.perf_counter() - t0 - lat) / n_iter
            fps = bsz / dt
            results[f"vision_{dtype}_b{bsz}"] = round(fps, 1)
            print(f"vision {dtype:9s} bsz {bsz:3d}: {fps:8.1f} frames/s"
                  f" = {fps / 5 / 60:6.2f} video-min/s @5fps"
                  f" | {vflops * fps / 1e12:6.1f} TFLOP/s", file=sys.stderr)

    tc = ClipTextConfig()
    tt = ClipTextTower(tc)
    tflops = text_flops_per_query(tc)
    ids = rng.integers(1, tc.vocab_size, (256, tc.context_length)).astype(np.int32)
    eot = np.full((256,), tc.context_length - 1, np.int32)
    tparams = tt.init(jax.random.PRNGKey(1), jnp.asarray(ids[:1]),
                      jnp.asarray(eot[:1]))["params"]
    print(f"text (12L, d512, ctx77): {tflops / 1e9:.2f} GFLOP/query",
          file=sys.stderr)
    for dtype in ("float32", "bfloat16"):
        jd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        p = jax.tree.map(
            lambda x: x.astype(jd) if x.dtype == np.float32 else x, tparams)
        fwd = jax.jit(lambda p, i, e: tt.apply({"params": p}, i, e))
        for bsz in (64, 256):
            i_, e_ = jnp.asarray(ids[:bsz]), jnp.asarray(eot[:bsz])
            tunnel_sync(fwd(p, i_, e_)[1])
            lat = sync_latency()
            n_iter = 10
            t0 = time.perf_counter()
            out = None
            for _ in range(n_iter):
                out = fwd(p, i_, e_)
            tunnel_sync(out[1])
            dt = (time.perf_counter() - t0 - lat) / n_iter
            qps = bsz / dt
            results[f"text_{dtype}_b{bsz}"] = round(qps, 1)
            print(f"text   {dtype:9s} bsz {bsz:3d}: {qps:8.1f} queries/s"
                  f" | {tflops * qps / 1e12:6.1f} TFLOP/s", file=sys.stderr)

    best = max(v for k, v in results.items() if k.startswith("vision"))
    print(json.dumps({
        "metric": "clip_extract_frames_per_s", "value": best,
        "unit": "frames/sec", "gflop_per_frame": round(vflops / 1e9, 1),
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
