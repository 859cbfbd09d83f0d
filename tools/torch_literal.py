"""The torch-literal packed QKV in-projection — the baseline that
transformer.PackedInProj is measured and parity-tested against.

A literal port of torch MultiheadAttention pushes each of q/k/v through the
FULL (D, 3D) packed matmul and slices the OUTPUT, computing and discarding
2/3 of the columns (XLA does not narrow the dot through the slice).
Shared by tools/bench_inproj.py (the A/B benchmark) and
tests/test_model_parity.py (bitwise-equality proof) so both always compare
against the same reference implementation.
"""

import flax.linen as nn
import jax.numpy as jnp


class FullInProj(nn.Module):
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lo, hi):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.d_model, 3 * self.d_model), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (3 * self.d_model,),
            jnp.float32,
        )
        y = (x.astype(self.dtype) @ kernel.astype(self.dtype)
             + bias.astype(self.dtype))
        return y[..., lo:hi]
