"""Checkpointing with best/latest/periodic semantics.

Mirrors the reference's three checkpoint flavors (cone/train.py:181-223):
`best` on stop-score improvement, `latest` every eval, periodic `e{NNNN}`
copies — plus the config snapshot (`opt.json` equivalent) so evaluation can
reconstruct the exact training config (cone/config.py:187-196).

Serialization is flax msgpack rather than orbax: orbax's async machinery
takes minutes per tiny save under this environment's PJRT plugin, and the
whole model is ~10 MB — a single atomic file write is the right tool.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from flax.serialization import from_bytes, to_bytes

from cone_tpu.config import ConeConfig


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class CheckpointManager:
    def __init__(self, workdir: str, cfg: Optional[ConeConfig] = None):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        if cfg is not None:
            cfg.save(os.path.join(workdir, "config.json"))

    def _path(self, tag: str) -> str:
        return os.path.join(self.workdir, f"model_{tag}.msgpack")

    def save(self, tag: str, params, opt_state=None, epoch: int = 0) -> str:
        state = {
            "params": jax.device_get(params),
            "opt_state": jax.device_get(opt_state) if opt_state is not None else None,
            "epoch": np.int32(epoch),
        }
        path = self._path(tag)
        _atomic_write(path, to_bytes(state))
        return path

    def restore(self, tag: str, params_template, opt_state_template=None):
        """Returns (params, opt_state, epoch). Templates supply the pytree
        structure (msgpack stores leaves only)."""
        with open(self._path(tag), "rb") as f:
            blob = f.read()
        target = {
            "params": params_template,
            "opt_state": opt_state_template,
            "epoch": np.int32(0),
        }
        state = from_bytes(target, blob)
        return state["params"], state["opt_state"], int(state["epoch"])

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))

    @staticmethod
    def load_config(workdir: str) -> ConeConfig:
        return ConeConfig.load(os.path.join(workdir, "config.json"))
