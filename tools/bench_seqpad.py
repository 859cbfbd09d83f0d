"""A/B: model.seq_pad_multiple (sublane-aligned encoder sequence) across
head geometries.

The fine-stage encoder sequence is max_v_l + max_q_l = 110 (ego4d) / 145
(MAD) — neither is a bf16 sublane multiple (16). Whether padding to the
multiple pays depends on d_head (how much of the forward the attention
tiling dominates). Measured on v5e (chained cheat-proof harness, one
process, full fine DETR forward, bf16):

    ego4d L=110->112: nheads=8 (d_head 32)  7.46 -> 7.12 ms  (+4.8%)
                      nheads=4 (d_head 64)  5.88 -> 6.17 ms  (SLOWER)
    MAD   L=145->160: nheads=8 (d_head 64)  20.8 -> 20.8 ms  (wash)
                      nheads=4 (d_head 128) 17.9 -> 17.6 ms  (+1.4%)
                      nheads=2 (d_head 256) 15.0 -> 12.2 ms  (+23%)

Encoded in the presets: ego4d_config pads (nheads=8), ego4d_scratch does
not (nheads=4), mad_config does not (nheads=8), mad_scratch pads
(nheads=2). Padded forwards are numerically identical on valid positions
(max out diff 0.00 measured at ego4d; pinned by
test_model_parity.py::test_seq_pad_multiple_is_a_noop).

    python tools/bench_seqpad.py        # no JAX_PLATFORMS override (axon)
"""

import dataclasses
import json
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
    from cone_tpu.models.init import build_model_and_params
    from tools.bench_fine_breakdown import chain_time

    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for name, (max_v_l, max_q_l, topk, qc, dim, head_sweep) in {
        "ego4d": (90, 20, 20, 32, 256, (8, 4)),
        "mad": (125, 20, 30, 32, 512, (8, 4, 2)),
    }.items():
        B = topk * qc
        rng = np.random.default_rng(0)
        tok = jnp.asarray(rng.standard_normal((B, max_q_l, dim)), jnp.float32)
        tlen = rng.integers(5, max_q_l + 1, B)
        tmask = jnp.asarray(np.arange(max_q_l)[None] < tlen[:, None],
                            jnp.float32)
        vid = jnp.asarray(rng.standard_normal((B, max_v_l, dim)), jnp.float32)
        vmask = jnp.ones((B, max_v_l), jnp.float32)
        l = max_v_l + max_q_l
        lp = -(-l // 16) * 16
        for nheads in head_sweep:
            res = {}
            for mult in (1, 16):
                mcfg = ModelConfig(
                    t_feat_dim=dim, v_motion_feat_dim=dim,
                    v_appear_feat_dim=dim, max_v_l=max_v_l, max_q_l=max_q_l,
                    compute_dtype="bfloat16", nheads=nheads,
                    seq_pad_multiple=mult)
                model, params = build_model_and_params(mcfg, seed=0)

                def detr(params, tok, tmask, vid, vmask, model=model):
                    o = model.apply({"params": params}, tok, tmask, vid,
                                    vmask, deterministic=True)
                    return o["pred_spans"], o["pred_logits"]

                res[mult] = chain_time(detr,
                                       (params, tok, tmask, vid, vmask), 1)
            print(f"{name}: B={B} L={l}->{lp} d={dim} nheads={nheads} bf16 |"
                  f" unpadded {res[1] * 1e3:.2f} ms  padded"
                  f" {res[16] * 1e3:.2f} ms  speedup x{res[1] / res[16]:.3f}",
                  file=sys.stderr)
            out[f"{name}_h{nheads}"] = {
                "unpadded_ms": round(res[1] * 1e3, 3),
                "padded_ms": round(res[16] * 1e3, 3)}
    print(json.dumps({"metric": "seq_pad_multiple_ab", "results": out}))


if __name__ == "__main__":
    main()
