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


def pytest_collection_modifyitems(config, items):
    """Run the real 2-process Gloo cluster tests FIRST, while the machine is
    at its least contended (nothing else from the suite has spawned worker
    threads or filled the page cache with model arrays yet). The ranks race
    Gloo's hard ~30 s communicator-rendezvous window on this 1-core host —
    scheduling them early measurably cuts the transient-failure retries
    (see tests/test_multiprocess.py dist_retries.json). Stable sort keeps
    every other test in its original order."""
    items.sort(key=lambda it: 0 if "test_multiprocess" in it.nodeid else 1)
