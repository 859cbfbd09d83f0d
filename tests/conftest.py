"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A pytest plugin imports jax before this conftest runs, so the env vars
# above don't take effect in-process — configure via jax.config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity tests compare against fp32 references; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Fast-lane partition (VERDICT r4 item 8). Files here are compile- or
# subprocess-bound — multi-step training loops, CLI/cluster subprocesses,
# 8-device sharded runs, fuzz sweeps — per the measured per-file wall costs
# of a full cold suite run (docs/RESULTS.md round 5: these 21 files carry
# ~2,300 s of the 2,536 s total). They get an auto-applied `heavy` marker,
# so the contributor inner loop is `pytest tests/ -m "not heavy"` (the
# remaining ~30 files: unit + parity + single-device pipeline tests) while
# `pytest tests/` stays the full release gate.
_HEAVY_TEST_FILES = {
    "test_cli_and_reformat.py",        # CLI subprocess roundtrips
    "test_convert_workflow.py",        # ckpt conversion subprocess chain
    "test_converter_key_coverage.py",  # builds live reference models
    "test_corpus_dtype.py",            # quantized-corpus device scans
    "test_corpus_retrieval.py",        # corpus-scale retrieval sweeps
    "test_determinism.py",             # two full training trajectories
    "test_edge_cases.py",              # short-video/degenerate pipeline sweeps
    "test_golden_regen.py",            # regenerates goldens vs live reference
    "test_multiprocess.py",            # real 2-process Gloo cluster
    "test_nms_device_parity.py",       # device NMS at MAD/TAN geometry
    "test_parity_runbook.py",          # full runbook script subprocess
    "test_pipeline_sharded.py",        # 8-device fused pipelines
    "test_real_data_journey.py",       # end-to-end subprocess journey
    "test_serve_ensemble_multiscale.py",  # HTTP server + flax towers
    "test_tan_e2e.py",                 # TAN training + sharded steps
    "test_tan_loop.py",                # TAN family train loops
    "test_tan_train_parity.py",        # 4-step trajectory replay
    "test_tan_variants.py",            # sparse-layout fuzz sweep
    "test_tp.py",                      # (dp, tp) training trajectories
    "test_train_loop.py",              # multi-epoch train loops
    "test_train_step.py",              # sharded/adapter train steps
}


def pytest_collection_modifyitems(config, items):
    """Two jobs, both order-stable:

    1. Auto-apply the `heavy` marker (fast lane = `-m "not heavy"`) to
       every test in _HEAVY_TEST_FILES and to everything already marked
       `slow` (slow is a subset of heavy).
    2. Run the real 2-process Gloo cluster tests FIRST, while the machine
       is at its least contended (nothing else from the suite has spawned
       worker threads or filled the page cache with model arrays yet). The
       ranks race Gloo's hard ~30 s communicator-rendezvous window on this
       1-core host — scheduling them early measurably cuts the
       transient-failure retries (see tests/test_multiprocess.py
       dist_retries.json)."""
    heavy = pytest.mark.heavy
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _HEAVY_TEST_FILES or item.get_closest_marker("slow"):
            item.add_marker(heavy)
    items.sort(key=lambda it: 0 if "test_multiprocess" in it.nodeid else 1)
