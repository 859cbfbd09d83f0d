"""Multi-host (DCN) execution: process setup, data sharding, result gather.

The reference is strictly single-GPU single-process (SURVEY.md §2.5); the
TPU-native scale-out plan is: data parallelism over ICI *within* a slice
(parallel/mesh.py), and DCN *across* hosts/slices only for embarrassingly
parallel work — per-process shards of the query/video sets — plus the
gradient all-reduce that pjit inserts for multi-host training. Concretely:

  * training: every process builds the SAME global batch (seeded loaders are
    deterministic), keeps only the rows its addressable devices own, and
    assembles a global jax.Array (`shard_batch` in parallel/mesh.py handles
    both single- and multi-process). XLA's gradient all-reduce then spans
    ICI inside a slice and DCN across slices — no hand-written collectives.
  * eval / corpus serving: videos shard by process (`shard_by_process`);
    each host grounds its shard on its LOCAL devices with zero cross-host
    traffic and the tiny submission rows merge at the end
    (`all_gather_rows`), so every process sees the full metric table and
    early-stopping stays consistent.

CPU testing: JAX supports multi-process CPU via the same
`jax.distributed.initialize` + Gloo collectives (tests/test_multiprocess.py
runs a real 2-process cluster).
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """Start the JAX distributed runtime.

    On TPU pods call with no arguments (the runtime auto-detects topology
    from the TPU environment). For CPU clusters / tests, pass the
    coordinator address + process layout explicitly and optionally the
    number of virtual CPU devices per process."""
    # NB: no jax.devices()/default_backend() here — the distributed runtime
    # must start BEFORE any backend initialization.
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def local_mesh(axis: str = "dp"):
    """Mesh over THIS process's addressable devices — the serving/eval mesh
    (per-host work shards need no cross-host collectives)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.local_devices()), (axis,))


def global_mesh(axis: str = "dp"):
    """Mesh over ALL devices (ICI x DCN flattened into one dp axis — the
    model is ~10 M params and stays replicated, so data parallelism is the
    only sharded dimension; SURVEY.md §2.5)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def shard_by_process(items: Sequence) -> List:
    """This process's strided shard of a global work list (videos, queries).
    Strided (not contiguous) so sorted-by-length corpora balance."""
    return list(items[jax.process_index()::jax.process_count()])


def all_gather_rows(rows: List[dict]) -> List[dict]:
    """Merge per-process lists of small JSON-serializable dicts (submission
    rows) across processes; every process returns the full concatenation,
    ordered by process index.

    Implementation: rows -> utf-8 json -> uint8 array padded to the global
    max (allgather needs equal shapes), one `process_allgather` over DCN.
    Submission rows are ~100 B each — this is metadata traffic, not a data
    path."""
    if jax.process_count() == 1:
        return list(rows)
    from jax.experimental import multihost_utils

    blob = json.dumps(rows).encode()
    n = np.array([len(blob)], np.int64)
    max_n = int(multihost_utils.process_allgather(n).max())
    padded = np.zeros(max_n, np.uint8)
    padded[: len(blob)] = np.frombuffer(blob, np.uint8)
    lens = multihost_utils.process_allgather(n).ravel()
    blobs = multihost_utils.process_allgather(padded)  # (P, max_n)
    out: List[dict] = []
    for p in range(jax.process_count()):
        out.extend(json.loads(bytes(blobs[p, : int(lens[p])]).decode()))
    return out


def assert_same_across_processes(value: float, what: str = "value") -> None:
    """Guard: a scalar that drives control flow (stop score, early-stop
    decision) must agree across processes or hosts would diverge."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    all_vals = multihost_utils.process_allgather(
        np.array([value], np.float64)).ravel()
    if not np.allclose(all_vals, all_vals[0], rtol=1e-6, atol=1e-9):
        raise RuntimeError(
            f"{what} diverged across processes: {all_vals.tolist()}")
