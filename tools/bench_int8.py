"""int8 MXU experiment: can quantized matmuls speed up the fine forward?

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
197 TFLOP/s), and the serving pipeline is fine-forward dominated
(docs/RESULTS.md: 89% of device time) at 15-23% bf16 MFU. This tool asks,
before any model wiring: does dynamic-activation int8 actually beat bf16
at the shapes the DETR forward runs?

Three measurements, chained cheat-proof harness, ONE process on the chip:

1. big-shape sanity (8192^3 matmul): confirms the int8 MXU path exists and
   its peak ratio through this jax/XLA stack;
2. FFN proxy at the Ego4D fine shape ((topk*qc*L, 256) x (256, 1024) x
   (1024, 256) with GELU): the largest single matmuls in the model;
3. projection proxy ((N, 256) x (256, 256)): the attention in/out
   projection shape.

int8 variant = per-row dynamic activation scales (max-abs / 127) + static
per-column weight scales, lax.dot_general(..., preferred_element_type=
int32), rescale by the outer product of scales. That is the standard
weight+activation quantization a serving path would use; its quant /
dequant elementwise passes ride HBM, which is exactly what might eat the
MXU win at d=256.

    python tools/bench_int8.py          # no JAX_PLATFORMS override (axon)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cone_tpu.utils.cache import jax_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir(jax.default_backend()))

    from tools.bench_fine_breakdown import chain_time

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)

    def quant_cols(w):
        """Static per-output-column int8 weights + fp32 scales."""
        s = np.abs(w).max(axis=0, keepdims=True) / 127.0
        s = np.where(s == 0, 1.0, s)
        q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    def int8_matmul(x, wq, ws):
        """Dynamic per-row activation quant + int8 MXU matmul + rescale."""
        ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        ax = jnp.where(ax == 0, 1.0, ax)
        xq = jnp.clip(jnp.rint(x / ax), -127, 127).astype(jnp.int8)
        acc = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * ax * ws

    # ---- 1. big-shape sanity: is the int8 MXU path real here? ----------
    n = 8192
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    aq = jnp.asarray(rng.integers(-127, 128, (n, n), np.int8))
    bq = jnp.asarray(rng.integers(-127, 128, (n, n), np.int8))

    t_bf = chain_time(lambda a, b: (a @ b).astype(jnp.bfloat16), (a, b), 0,
                      iters=(5, 25))
    t_i8 = chain_time(
        lambda aq, bq: lax.dot_general(
            aq, bq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.bfloat16),
        (aq, bq), 0, iters=(5, 25))
    fl = 2 * n**3
    print(f"8192^3 sanity: bf16 {t_bf * 1e3:.2f} ms ({fl / t_bf / 1e12:.0f} "
          f"TFLOP/s)  int8 {t_i8 * 1e3:.2f} ms ({fl / t_i8 / 1e12:.0f} "
          f"TOP/s)  ratio x{t_bf / t_i8:.2f}")

    # ---- 2+3. fine-forward-shaped proxies -------------------------------
    for name, (rows, d_in, d_mid) in {
        "ffn  (ego4d fine)": (640 * 112, 256, 1024),
        "proj (ego4d fine)": (640 * 112, 256, 256),
        "ffn  (mad fine)": (960 * 160, 512, 2048),
    }.items():
        x = jnp.asarray(rng.standard_normal((rows, d_in)), jnp.float32)
        w1 = rng.standard_normal((d_in, d_mid)).astype(np.float32) / 16
        w2 = rng.standard_normal((d_mid, d_in)).astype(np.float32) / 32
        w1b, w2b = jnp.asarray(w1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16)
        w1q, w1s = quant_cols(w1)
        w2q, w2s = quant_cols(w2)

        def block_bf16(x, w1b=w1b, w2b=w2b):
            h = jax.nn.gelu(x.astype(jnp.bfloat16) @ w1b)
            return (h @ w2b).astype(jnp.float32)

        def block_int8(x, w1q=w1q, w1s=w1s, w2q=w2q, w2s=w2s):
            h = jax.nn.gelu(int8_matmul(x, w1q, w1s))
            return int8_matmul(h, w2q, w2s)

        want = jax.device_get(jax.jit(block_bf16)(x))
        got = jax.device_get(jax.jit(block_int8)(x))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        t_bf = chain_time(block_bf16, (x,), 0)
        t_i8 = chain_time(block_int8, (x,), 0)
        print(f"{name}: rows={rows} {d_in}->{d_mid} | bf16 {t_bf * 1e3:.3f} ms"
              f"  int8 {t_i8 * 1e3:.3f} ms  speedup x{t_bf / t_i8:.3f}"
              f"  | max rel diff vs bf16 {rel:.3f}")


if __name__ == "__main__":
    main()
