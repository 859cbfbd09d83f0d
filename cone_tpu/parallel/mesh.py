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


def shard_batch(batch: dict, mesh: Mesh, axis: str = "dp") -> dict:
    """Device-put every array in a host batch with its leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
