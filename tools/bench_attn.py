"""Fused (flash-style) Pallas attention vs the XLA masked-einsum path —
measured and REJECTED (kept as the record of the experiment).

Hypothesis: the fine-stage encoder self-attention (models/transformer.py
MultiheadAttention; B=640 windows, H=8, L=110, d_head=32) materializes the
(B, H, L, L) logits+weights through HBM (~0.7 GB/layer at serving shapes);
a VMEM-resident flash-style kernel should reclaim that traffic.

Result (v5e via tunnel, tunnel_sync-fenced, one process):

    float32   bs=8   xla 1.85 ms   pallas 3.97 ms   (0.47x)
    bfloat16  bs=16  xla 0.86 ms   pallas 3.90 ms   (0.22x)

The kernel LOSES 2-4x. d_head=32 makes every QK^T/PV a K=32 contraction
(25% of the MXU's native K=128), and the per-window-per-head loop
(bs*H = 64-128 tiny matmuls per grid step) cannot be batched inside the
kernel: merging heads into one contraction is semantically wrong
(block-diagonal), and reshaping (L, 256) -> (L, 8, 32) is a
non-lane-aligned reshape that Mosaic does not lower. XLA's batched einsum
drives the same small contractions through the MXU with better pipelining
and pays the HBM traffic anyway — the traffic saving (~0.4 ms/layer
analytic) is smaller than the kernel's compute inefficiency (~2-3 ms).

Same conclusion as r2's jax.nn.dot_product_attention A/B (1.3x slower than
the masked einsum at these shapes, docs/RESULTS.md): at d=256/L=110 the
hand-written XLA attention is already the fastest formulation we can find;
the remaining fine-stage headroom is architectural (nheads — see the
*_scratch presets). Run: python tools/bench_attn.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cone_tpu.utils.perf import sync_latency, tunnel_sync

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))
    NEG_INF = float(jnp.finfo(jnp.float32).min)

    def attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, nheads):
        bs, l, d = q_ref.shape
        hd = d // nheads
        scale = hd ** -0.5
        for b in range(bs):
            ignore = mask_ref[b, :] > 0
            outs = []
            for h in range(nheads):
                lo, hi = h * hd, (h + 1) * hd
                q = q_ref[b, :, lo:hi] * scale
                k = k_ref[b, :, lo:hi]
                v = v_ref[b, :, lo:hi]
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                logits = jnp.where(ignore[None, :], NEG_INF, logits)
                w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
                outs.append(
                    jnp.dot(w, v, preferred_element_type=jnp.float32))
            out_ref[b, :, :] = jnp.concatenate(outs, -1).astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("nheads", "block_b"))
    def pallas_attention(q, k, v, key_padding_mask, nheads, block_b=8):
        b, l, d = q.shape
        mask = key_padding_mask.astype(jnp.float32)
        spec3 = pl.BlockSpec((block_b, l, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        spec_m = pl.BlockSpec((block_b, l), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(attn_kernel, nheads=nheads),
            grid=(b // block_b,),
            in_specs=[spec3, spec3, spec3, spec_m],
            out_specs=spec3,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q, k, v, mask)

    def xla_attn(q, k, v, mask, nheads):
        # models/transformer.py MultiheadAttention core, verbatim semantics
        b, l, d = q.shape
        hd = d // nheads

        def split(x):
            return x.reshape(b, l, nheads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh * (hd ** -0.5), kh)
        logits = jnp.where(mask[:, None, None, :], NEG_INF, logits)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return o.transpose(0, 2, 1, 3).reshape(b, l, d)

    B, L, D, H = 640, 110, 256, 8  # ego4d fine-stage serving shape
    rng = np.random.default_rng(0)
    results = {}
    for dt in (jnp.float32, jnp.bfloat16):
        q, k, v = (jnp.asarray(rng.normal(size=(B, L, D)), dt)
                   for _ in range(3))
        lens = rng.integers(60, L + 1, B)
        mask = jnp.asarray(np.arange(L)[None] >= lens[:, None])
        f_x = jax.jit(lambda q, k, v, m: xla_attn(q, k, v, m, H))
        a = f_x(q, k, v, mask)
        tunnel_sync(a)
        for bs in (8, 16):
            b_ = pallas_attention(q, k, v, mask, H, block_b=bs)
            tunnel_sync(b_)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b_.astype(jnp.float32))))
            lat = sync_latency()
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                o = f_x(q, k, v, mask)
            tunnel_sync(o)
            t_x = (time.perf_counter() - t0 - lat) / n
            t0 = time.perf_counter()
            for _ in range(n):
                o = pallas_attention(q, k, v, mask, H, block_b=bs)
            tunnel_sync(o)
            t_p = (time.perf_counter() - t0 - lat) / n
            name = np.dtype(dt).name
            results[f"{name}_bs{bs}"] = {
                "xla_ms": round(t_x * 1e3, 3),
                "pallas_ms": round(t_p * 1e3, 3),
                "max_abs_err": err,
            }
            print(f"{name:9s} bs={bs:2d} max|err|={err:.2e}"
                  f"  xla={t_x * 1e3:6.3f} ms  pallas={t_p * 1e3:6.3f} ms"
                  f"  ({t_x / t_p:4.2f}x)", file=sys.stderr)

    import json

    print(json.dumps({"metric": "attn_xla_vs_pallas", "shapes": [B, L, D, H],
                      "results": results,
                      "conclusion": "xla wins; kernel rejected"}))


if __name__ == "__main__":
    main()
