"""Checkpointing with best/latest/periodic semantics.

Mirrors the reference's three checkpoint flavors (cone/train.py:181-223):
`best` on stop-score improvement, `latest` every eval, periodic `e{NNNN}`
copies — plus the config snapshot (`opt.json` equivalent) so evaluation can
reconstruct the exact training config (cone/config.py:187-196). Training
state beyond params/optimizer — the early-stop counters and the plateau
scheduler's best/num_bad — rides in an `extra` dict, the counterpart of the
reference saving `lr_scheduler.state_dict()` (cone/train.py:184-191), so a
resumed run does not re-arm a fresh patience window.

`load_params` restores weights only, from either a manager checkpoint or a
raw `{"params": ...}` msgpack (tools/convert_ckpt.py --out) — the
warm-start path for fine-tuning from a released/converted checkpoint
(the reference's --resume without --resume_all, cone/config.py:63-66,
inference.py:525-533).

Serialization is flax msgpack rather than orbax: orbax's async machinery
takes minutes per tiny save under this environment's PJRT plugin, and the
whole model is ~10 MB — a single atomic file write is the right tool.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from flax.serialization import from_state_dict, msgpack_restore, to_bytes

from cone_tpu.config import ConeConfig


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_params(path: str, params_template):
    """Weights-only load: accepts a CheckpointManager file (its "params"
    entry) or a raw `{"params": ...}` msgpack from tools/convert_ckpt.py.
    Optimizer/epoch state in the file is ignored."""
    with open(path, "rb") as f:
        raw = msgpack_restore(f.read())
    tree = raw.get("params", raw)
    return from_state_dict(params_template, tree)


class CheckpointManager:
    def __init__(self, workdir: str, cfg: Optional[ConeConfig] = None):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        if cfg is not None:
            cfg.save(os.path.join(workdir, "config.json"))

    def _path(self, tag: str) -> str:
        return os.path.join(self.workdir, f"model_{tag}.msgpack")

    def save(self, tag: str, params, opt_state=None, epoch: int = 0,
             extra: Optional[Dict[str, float]] = None) -> str:
        state = {
            "params": jax.device_get(params),
            "opt_state": jax.device_get(opt_state) if opt_state is not None else None,
            "epoch": np.int32(epoch),
        }
        if extra:
            state["extra"] = {k: np.float64(v) for k, v in extra.items()}
        path = self._path(tag)
        _atomic_write(path, to_bytes(state))
        return path

    def restore(self, tag: str, params_template, opt_state_template=None):
        """Returns (params, opt_state, epoch, extra). Templates supply the
        pytree structure (msgpack stores leaves only); `extra` is the flat
        scalar dict passed to save() ({} for checkpoints written without
        one, including pre-upgrade files)."""
        with open(self._path(tag), "rb") as f:
            raw = msgpack_restore(f.read())
        params = from_state_dict(params_template, raw["params"])
        opt_state = None
        if opt_state_template is not None and raw.get("opt_state") is not None:
            opt_state = from_state_dict(opt_state_template, raw["opt_state"])
        extra = {k: float(v) for k, v in raw.get("extra", {}).items()}
        return params, opt_state, int(raw["epoch"]), extra

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))

    @staticmethod
    def load_config(workdir: str) -> ConeConfig:
        return ConeConfig.load(os.path.join(workdir, "config.json"))
