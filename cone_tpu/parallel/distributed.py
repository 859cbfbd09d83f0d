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


_barrier_seq = [0]


def barrier(tag: str = "sync", timeout_s: int = 900) -> None:
    """Align all processes via the coordination service (no Gloo).

    XLA's CPU Gloo collectives create their communicator context lazily at
    the FIRST cross-host collective, with a hard ~30 s window for the
    key-value rendezvous — but ranks can arrive minutes apart (each
    compiles programs for its own eval shard's video shapes). This barrier
    rides the coordination service instead (generous timeout, no
    communicator), so call it immediately before any collective region and
    the Gloo window only has to cover RPC latency. Every process must call
    it the same number of times in the same order (the sequence number is
    part of the barrier id)."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:  # not under jax.distributed (e.g. TPU auto-init path)
        return
    _barrier_seq[0] += 1
    client.wait_at_barrier(
        f"cone_tpu:{tag}:{_barrier_seq[0]}", timeout_in_ms=timeout_s * 1000)


def shard_by_process(items: Sequence) -> List:
    """This process's strided shard of a global work list (videos, queries).
    Strided (not contiguous) so sorted-by-length corpora balance."""
    return list(items[jax.process_index()::jax.process_count()])


def _kv_allgather(payload: bytes, tag: str, timeout_s: int = 900) -> List[bytes]:
    """All-gather small byte payloads across processes over the
    COORDINATION-SERVICE key-value store — NOT a device collective.

    Submission rows and control scalars are ~100 B metadata; routing them
    through Gloo device collectives would interleave extra cross-process
    communicator rendezvous with the training step's all-reduce clique
    (observed to race its ~30 s KV window and kill ranks). The control
    plane is the right transport: no communicators, generous timeouts,
    deterministic. Every process must call this in the same order (the
    sequence number namespaces the keys)."""
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    assert client is not None, "jax.distributed is not initialized"
    _barrier_seq[0] += 1
    key = f"cone_tpu:ag:{tag}:{_barrier_seq[0]}"
    client.key_value_set_bytes(f"{key}:{jax.process_index()}", payload)
    out = [
        client.blocking_key_value_get_bytes(f"{key}:{p}", timeout_s * 1000)
        for p in range(jax.process_count())
    ]
    # the coordinator keeps every key for the life of the job; a long run
    # gathering MAD-scale submission tables each eval would grow rank 0's
    # coordination service unboundedly. Each process deletes its OWN key
    # once every peer must have read it (the gather above doubles as the
    # barrier: all peers hold all payloads before anyone returns).
    try:
        barrier(f"ag-done:{tag}", timeout_s)
        client.key_value_delete(f"{key}:{jax.process_index()}")
    except (AttributeError, RuntimeError):  # older clients: accept the leak
        pass
    return out


def all_gather_obj(obj, tag: str = "obj") -> List:
    """All-gather ONE JSON-serializable object per process; every process
    returns the per-process list in process order. Control-plane transport
    (_kv_allgather) — metadata only, not a tensor path."""
    if jax.process_count() == 1:
        return [obj]
    return [json.loads(b.decode())
            for b in _kv_allgather(json.dumps(obj).encode(), tag)]


def all_gather_rows(rows: List[dict]) -> List[dict]:
    """Merge per-process lists of small JSON-serializable dicts (submission
    rows) across processes; every process returns the full concatenation,
    ordered by process index."""
    out: List[dict] = []
    for part in all_gather_obj(rows, "rows"):
        out.extend(part)
    return out


def assert_same_across_processes(value: float, what: str = "value") -> None:
    """Guard: a scalar that drives control flow (stop score, early-stop
    decision) must agree across processes or hosts would diverge."""
    if jax.process_count() == 1:
        return
    blobs = _kv_allgather(np.float64(value).tobytes(), "same")
    all_vals = np.frombuffer(b"".join(blobs), np.float64)
    if not np.allclose(all_vals, all_vals[0], rtol=1e-6, atol=1e-9):
        raise RuntimeError(
            f"{what} diverged across processes: {all_vals.tolist()}")
