"""Device mesh + sharding helpers.

The model is ~10 M params, so parameters default to replicated and the batch
dimension (training window-batches; inference query x window batches) is the
primary sharded axis — data parallelism over ICI ("dp"). This is the
TPU-native equivalent of scaling the reference's single-GPU pipeline
(SURVEY.md §2.5): the per-window Python loop becomes a sharded batch axis.

An optional second mesh axis ("tp") tensor-shards the transformer's matmul
parameters Megatron-style (column-parallel QKV/FFN-in, row-parallel
out-proj/FFN-out — see `param_shardings`). At CONE's 4.5-10 M parameters TP
is never a capacity necessity; it exists because the framework is the
product: the same annotate-and-let-GSPMD-partition recipe carries to bigger
towers (the flax CLIP/EgoVLP extractors) unchanged, and XLA inserts the
all-reduces over ICI. Pipeline/sequence axes are deliberately absent: 2+2
transformer layers and seq<=128 leave nothing for pp/sp to ride
(docs/PARITY.md "Parallelism").
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp",
              tp: int = 1) -> Mesh:
    """1-D dp mesh, or a (dp, tp) 2-D mesh when tp > 1.

    tp slots into the fastest-varying (innermost, adjacent-device) positions
    so its per-layer all-reduces ride the shortest ICI hops; dp's one
    per-step gradient reduction takes the outer axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if tp <= 1:
        return Mesh(np.array(devs[:n]), (axis,))
    assert n % tp == 0, f"mesh size {n} must divide by tp={tp}"
    return Mesh(np.array(devs[:n]).reshape(n // tp, tp), (axis, "tp"))


def tp_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or "tp" not in mesh.axis_names:
        return 1
    return int(mesh.shape["tp"])


def dp_submesh(mesh: Mesh, axis: str = "dp") -> Mesh:
    """Flatten a (dp, tp) mesh into a 1-D dp mesh over the same devices —
    the eval/serving layout (params replicated, queries sharded)."""
    return Mesh(mesh.devices.reshape(-1), (axis,))


# Megatron-style TP placement for the DETR transformer (models/transformer.py):
# column-parallel producers paired with row-parallel consumers. Note the
# packed (D, 3D) QKV kernel is split by contiguous columns, which is NOT
# head-aligned (Megatron proper shards per head); GSPMD keeps it numerically
# correct (test_tp pins the full DP trajectory) but inserts resharding around
# the (B, L, nheads, d_head) reshape rather than the textbook one-all-reduce-
# per-block schedule. Measured on the compiled tp=2 train step (8-dev CPU
# mesh, tools/count_collectives in docs/RESULTS.md round 5): +20 all-reduces
# and +114 collective-permutes vs pure DP. Acceptable here — TP on a 10 M-param
# model is a capability demo, not a capacity need; a clean Megatron schedule
# would require unpacking QKV or shard_map-ing the block. Matched by
# param-path suffix; anything unmatched (LayerNorms, heads, input projections,
# embeddings — all tiny) stays replicated.
_TP_RULES = (
    ("in_proj/kernel", P(None, "tp")),   # (D, 3D) packed QKV, columns split
    ("in_proj/bias", P("tp")),
    ("out_proj/kernel", P("tp", None)),  # (D, D) row-parallel
    ("linear1/kernel", P(None, "tp")),   # (D, F) FFN in, columns split
    ("linear1/bias", P("tp")),
    ("linear2/kernel", P("tp", None)),   # (F, D) FFN out, row-parallel
)


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a param tree on a (dp, tp) mesh.

    A rule only applies when the sharded dimension divides by the tp size
    (otherwise that leaf silently stays replicated — correctness never
    depends on geometry). On a 1-D mesh everything is replicated.

    Works on any pytree whose leaf PATHS end with the transformer param
    names — including optimizer states, whose moment trees nest the param
    tree verbatim (scalars like step counts replicate)."""
    tp = tp_size(mesh)

    def path_str(path) -> str:
        return "/".join(str(getattr(k, "key", k)) for k in path)

    def spec_for(path, leaf):
        shape = getattr(leaf, "shape", None)
        if tp > 1 and shape is not None:
            s = path_str(path)
            for suffix, spec in _TP_RULES:
                if not s.endswith(suffix):
                    continue
                ok = len(spec) == len(shape) and all(
                    name is None or shape[dim] % tp == 0
                    for dim, name in enumerate(spec)
                )
                if ok:
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """device_put a param tree with `param_shardings` (host round trip first
    so re-sharding an already-placed tree is layout-change, not an error)."""
    return jax.device_put(jax.device_get(params), param_shardings(params, mesh))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "dp",
                local: bool = False) -> dict:
    """Device-put every array in a host batch with its leading dim sharded.

    Multi-process (DCN) meshes: each process contributes the contiguous
    row block its addressable devices own — the standard
    `make_array_from_process_local_data` data-parallel layout (mesh device
    order is jax.devices(), which is process-major). With `local=False`
    the batch is the full GLOBAL batch (every process built the same one)
    and this process's block is sliced out; with `local=True` the batch
    already contains ONLY this process's rows (the loader materialized
    just its slice — see data/dataset.py TrainLoader.epoch)."""
    sh = batch_sharding(mesh, axis)
    pi0 = jax.process_index()
    if jax.process_count() == 1 or all(
            d.process_index == pi0 for d in mesh.devices.flat):
        # plain device_put only when EVERY mesh device is addressable by
        # this process (a size comparison would wrongly route a
        # small-mesh multi-process run here and device_put onto devices
        # another process owns)
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    pc, pi = jax.process_count(), jax.process_index()

    def put(v):
        v = np.asarray(v)
        if not local:
            n = v.shape[0]
            assert n % pc == 0, (
                f"global batch dim {n} must divide by process count {pc}")
            v = v[pi * (n // pc) : (pi + 1) * (n // pc)]
        return jax.make_array_from_process_local_data(sh, v)

    return {k: put(v) for k, v in batch.items()}
