"""A/B: model.seq_pad_multiple (sublane-aligned encoder sequence).

The fine-stage encoder sequence is max_v_l + max_q_l = 110 (ego4d) / 145
(MAD) — neither is a bf16 sublane multiple (16). Standalone probes showed
the attention core at L=112 runs ~20% faster than at L=110 despite the
extra positions; this tool times the FULL fine DETR forward both ways in
one process (chained cheat-proof harness), which is what the preset choice
encodes: ego4d pads to 112 (seq_pad_multiple=16), MAD stays unpadded
(145 -> 160 measured net-negative).

    python tools/bench_seqpad.py        # no JAX_PLATFORMS override (axon)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/cone_tpu_jax_cache_{jax.default_backend()}")
    from cone_tpu.config import ModelConfig
    from cone_tpu.models.init import build_model_and_params
    from tools.bench_fine_breakdown import chain_time

    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for name, (max_v_l, max_q_l, topk, qc, dim) in {
        "ego4d": (90, 20, 20, 32, 256),
        "mad": (125, 20, 30, 32, 512),
    }.items():
        base = ModelConfig(t_feat_dim=dim, v_motion_feat_dim=dim,
                           v_appear_feat_dim=dim, max_v_l=max_v_l,
                           max_q_l=max_q_l, compute_dtype="bfloat16")
        B = topk * qc
        rng = np.random.default_rng(0)
        tok = jnp.asarray(rng.standard_normal((B, max_q_l, dim)), jnp.float32)
        tlen = rng.integers(5, max_q_l + 1, B)
        tmask = jnp.asarray(np.arange(max_q_l)[None] < tlen[:, None],
                            jnp.float32)
        vid = jnp.asarray(rng.standard_normal((B, max_v_l, dim)), jnp.float32)
        vmask = jnp.ones((B, max_v_l), jnp.float32)

        results, outs = {}, {}
        for mult in (1, 16):
            mcfg = dataclasses.replace(base, seq_pad_multiple=mult)
            model, params = build_model_and_params(mcfg, seed=0)

            def detr(params, tok, tmask, vid, vmask, model=model):
                o = model.apply({"params": params}, tok, tmask, vid, vmask,
                                deterministic=True)
                return o["pred_spans"], o["pred_logits"]

            outs[mult] = jax.device_get(
                jax.jit(detr)(params, tok, tmask, vid, vmask))
            results[mult] = chain_time(detr, (params, tok, tmask, vid, vmask), 1)
        dmax = max(np.abs(a - b).max()
                   for a, b in zip(outs[1], outs[16]))
        l = max_v_l + max_q_l
        lp = -(-l // 16) * 16
        print(f"{name}: B={B} L={l}->{lp} d={dim} bf16 | unpadded "
              f"{results[1] * 1e3:.2f} ms  padded {results[16] * 1e3:.2f} ms"
              f"  speedup x{results[1] / results[16]:.3f} | "
              f"max|out diff| {dmax:.2e}", file=sys.stderr)
        out[name] = {"unpadded_ms": round(results[1] * 1e3, 3),
                     "padded_ms": round(results[16] * 1e3, 3),
                     "max_out_diff": float(dmax)}
    print(json.dumps({"metric": "seq_pad_multiple_ab", "results": out}))


if __name__ == "__main__":
    main()
