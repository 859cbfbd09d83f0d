"""A/B: column-sliced vs full packed QKV in-projection in the DETR forward.

DETR adds pos embeds to Q/K but not V (cone/transformer.py:242-247), so the
three in-projection inputs differ and a torch-literal implementation pushes
each through the full (D, 3D) packed matmul, discarding 2/3 of the columns
(2 full matmuls per self-attn after XLA CSE of the identical q/k input, 3
per cross-attn). transformer.PackedInProj instead slices the KERNEL —
bitwise-identical outputs, ~22% fewer fine-stage FLOPs analytically.

This tool times the fine DETR forward (the serving pipeline's dominant
component, 89% of device time — docs/RESULTS.md) both ways IN ONE PROCESS
on the real chip, at the Ego4D bench shape and the MAD shape, using the
chained cheat-proof harness from tools/bench_fine_breakdown.py.

    python tools/bench_inproj.py        # no JAX_PLATFORMS override (axon)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from cone_tpu.config import ModelConfig
    from cone_tpu.models import transformer
    from cone_tpu.models.init import build_model_and_params
    from tools.bench_fine_breakdown import chain_time

    print(f"devices: {jax.devices()}", file=sys.stderr)

    sliced_cls = transformer.PackedInProj

    from tools.torch_literal import FullInProj

    for name, (max_v_l, max_q_l, topk, qc, dim) in {
        "ego4d": (90, 20, 20, 32, 256),
        "mad": (125, 20, 30, 32, 512),
    }.items():
        mcfg = ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                           v_appear_feat_dim=dim, max_v_l=max_v_l,
                           max_q_l=max_q_l, compute_dtype="bfloat16")
        model, params = build_model_and_params(mcfg, seed=0)
        B = topk * qc
        rng = np.random.default_rng(0)
        tok = jnp.asarray(rng.standard_normal((B, max_q_l, dim)), jnp.float32)
        tmask = jnp.ones((B, max_q_l), jnp.float32)
        vid = jnp.asarray(rng.standard_normal((B, max_v_l, dim)), jnp.float32)
        vmask = jnp.ones((B, max_v_l), jnp.float32)

        def detr(params, tok, tmask, vid, vmask):
            out = model.apply({"params": params}, tok, tmask, vid, vmask,
                              deterministic=True)
            return out["pred_spans"], out["pred_logits"]

        results = {}
        outs = {}
        for variant, cls in [("sliced", sliced_cls), ("full", FullInProj)]:
            transformer.PackedInProj = cls
            try:
                outs[variant] = jax.device_get(
                    jax.jit(detr)(params, tok, tmask, vid, vmask))
                results[variant] = chain_time(
                    detr, (params, tok, tmask, vid, vmask), 1)
            finally:
                transformer.PackedInProj = sliced_cls
        dmax = max(np.abs(a - b).max()
                   for a, b in zip(outs["sliced"], outs["full"]))
        s, f = results["sliced"], results["full"]
        print(f"{name}: B={B} L={max_v_l + max_q_l} d={dim} bf16 | "
              f"full {f * 1e3:.2f} ms  sliced {s * 1e3:.2f} ms  "
              f"speedup x{f / s:.3f} | max|out diff| {dmax:.2e}")


if __name__ == "__main__":
    main()
