"""cone_tpu — TPU-native coarse-to-fine long-video temporal grounding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of houzhijian/CONE
(ACL 2023): given a natural-language query and a long video represented as a
sequence of pre-extracted clip features, return a ranked list of
[start_sec, end_sec, score] moments.

Architecture (all fixed-shape, jit-compiled, sharded with jax.sharding):
  - ops/       pure jnp kernel library: span geometry, window math, IoU,
               Hungarian matching, masked pooling, vectorized NMS, Pallas
               kernels for the coarse scoring stage.
  - models/    flax.linen Moment-DETR-style grounding model (CONE head) and
               the 2D-TAN alternate head.
  - data/      feature stores (in-memory / packed native store), window
               samplers, fixed-shape batchers.
  - train/     optax/orbax training loop with DP sharding.
  - eval/      coarse+fine inference pipeline, score fusion, NMS, official
               Ego4D-NLQ / MAD metric implementations.
  - parallel/  mesh construction and sharding helpers.

The key TPU-first design decision (vs the reference's per-window Python
loops, cone/inference.py:276-299 and cone/ego4d_mad_dataloader.py:144-159):
windows are a *batch axis*. All top-k windows of a query — and all queries of
an eval chunk — are padded to (K, max_v_l, D) with masks and processed in a
single device call, sharded over the mesh.
"""

__version__ = "0.1.0"
