"""Persistent jax compilation-cache location, keyed by host machine.

The cache stores XLA:CPU AOT results that are MACHINE-specific: loading an
entry compiled on a host with different vector features warns
"Machine type used for XLA:CPU compilation doesn't match the machine type
for execution ... could lead to execution errors such as SIGILL" — and in
practice killed multi-process ranks mid-collective when this environment
rescheduled onto a VM with a different CPU (Gloo rendezvous timeout,
tests/test_multiprocess.py). Keying the directory by the CPU-flags hash
makes a host change start a fresh cache instead of loading foreign code.
"""

from __future__ import annotations

import hashlib


def _machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


def jax_cache_dir(backend: str) -> str:
    return f"/tmp/cone_tpu_jax_cache_{backend}_{_machine_tag()}"
