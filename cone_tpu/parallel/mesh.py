"""Device mesh + sharding helpers.

The model is ~10 M params, so parameters are replicated and the batch
dimension (training window-batches; inference query x window batches) is the
only sharded axis — pure data parallelism over ICI ("dp"). This is the
TPU-native equivalent of scaling the reference's single-GPU pipeline
(SURVEY.md §2.5): the per-window Python loop becomes a sharded batch axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


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
