"""Live-reference golden regeneration gate.

Every parity fixture in tests/golden/ was produced by a tools/gen_golden*.py
script importing the reference at /root/reference. A bug in a generator (the
class of bug the r3 double-layer-norm find proved exists) is invisible to the
tests, because fixture and test agree by construction. This tool closes that
hole: it re-runs EVERY generator against the live reference into a scratch
directory and diffs the regenerated arrays against the committed fixtures —
converting the parity story from "pinned once" to "re-derivable on demand".

Usage:
    python tools/regen_goldens.py --check     # regenerate + diff (default)
    python tools/regen_goldens.py --update    # overwrite committed fixtures
    python tools/regen_goldens.py --check --only tan   # substring filter

Each generator runs in its own subprocess (they install import shims and
seed global RNGs) with cwd = a scratch dir holding a `tools` symlink, so
their repo-relative writes land in the scratch tree, never in the repo.
Exit code 0 = every fixture matches bit-for-bit.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")

# generator script -> fixture files it writes (relative to tests/golden/)
GENERATORS = {
    "gen_golden.py": ["cone_forward.npz"],
    "gen_golden_train.py": ["train_trajectory.npz"],
    "gen_golden_multispan.py": ["cone_multispan.npz"],
    "gen_golden_e2e.py": ["e2e_inference.npz", "e2e_inference_mad.npz"],
    "gen_golden_edges.py": ["edge_inference.npz"],
    "gen_golden_egovlp.py": ["egovlp_tower.npz"],
    "gen_golden_postproc.py": ["postproc.npz", "postproc_mad.npz"],
    "gen_golden_tan.py": ["tan_forward.npz"],
    "gen_golden_tan_train.py": ["tan_train_trajectory.npz"],
    "gen_golden_tan_stride2.py": ["tan_forward_stride2.npz"],
    "gen_golden_eval_ensemble.py": ["eval_ensemble_golden.json"],
}


def _diff_npz(committed: str, regenerated: str) -> list:
    """Bit-exact comparison of two npz files; returns human-readable diffs."""
    a = dict(np.load(committed, allow_pickle=False).items())
    b = dict(np.load(regenerated, allow_pickle=False).items())
    out = []
    for k in sorted(set(a) | set(b)):
        if k not in a:
            out.append(f"extra array {k!r}")
        elif k not in b:
            out.append(f"missing array {k!r}")
        elif a[k].shape != b[k].shape or a[k].dtype != b[k].dtype:
            out.append(f"{k}: shape/dtype {a[k].shape}/{a[k].dtype} vs "
                       f"{b[k].shape}/{b[k].dtype}")
        elif not np.array_equal(a[k], b[k], equal_nan=True):
            with np.errstate(all="ignore"):
                mx = float(np.max(np.abs(
                    a[k].astype(np.float64) - b[k].astype(np.float64))))
            out.append(f"{k}: values differ (max abs diff {mx:.3e})")
    return out


def _diff_json(committed: str, regenerated: str) -> list:
    with open(committed) as f:
        a = json.load(f)
    with open(regenerated) as f:
        b = json.load(f)
    return [] if a == b else ["JSON content differs"]


def run(check: bool, only: str = "") -> int:
    scratch = tempfile.mkdtemp(prefix="regen_goldens_")
    os.makedirs(os.path.join(scratch, "tests", "golden"))
    # copy (NOT symlink) the scripts: a symlinked tools/ would resolve
    # `os.path.dirname(__file__)/..` through the link target and leak
    # generator writes into the real repo tree
    os.makedirs(os.path.join(scratch, "tools"))
    for py in os.listdir(os.path.join(REPO, "tools")):
        if py.endswith(".py"):
            shutil.copy2(os.path.join(REPO, "tools", py),
                         os.path.join(scratch, "tools", py))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"  # generators never need the tunneled TPU

    failures = []
    try:
        for script, fixtures in GENERATORS.items():
            if only and only not in script:
                continue
            proc = subprocess.run(
                [sys.executable, os.path.join("tools", script)],
                cwd=scratch, env=env, capture_output=True, text=True,
                timeout=600,
            )
            if proc.returncode != 0:
                failures.append((script, [f"generator failed rc={proc.returncode}:"
                                          f"\n{proc.stderr[-2000:]}"]))
                print(f"[regen] {script}: GENERATOR FAILED")
                continue
            for fx in fixtures:
                new = os.path.join(scratch, "tests", "golden", fx)
                old = os.path.join(GOLDEN, fx)
                if not os.path.exists(new):
                    failures.append((script, [f"{fx}: not produced"]))
                    print(f"[regen] {fx}: NOT PRODUCED")
                    continue
                if not check:
                    shutil.copy2(new, old)
                    print(f"[regen] {fx}: updated")
                    continue
                diff = (_diff_json if fx.endswith(".json") else _diff_npz)(
                    old, new)
                if diff:
                    failures.append((fx, diff))
                    print(f"[regen] {fx}: MISMATCH")
                    for d in diff[:10]:
                        print(f"    {d}")
                else:
                    print(f"[regen] {fx}: ok")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    if failures:
        print(f"[regen] FAILED: {len(failures)} generator/fixture problem(s)")
        return 1
    print("[regen] all fixtures re-derived from the live reference and match")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", default=True,
                    help="regenerate into scratch and diff (default)")
    ap.add_argument("--update", action="store_true",
                    help="overwrite the committed fixtures instead")
    ap.add_argument("--only", default="", help="substring filter on scripts")
    args = ap.parse_args()
    if not os.path.isdir("/root/reference"):
        print("[regen] /root/reference not present; nothing to check")
        return 0
    return run(check=not args.update, only=args.only)


if __name__ == "__main__":
    sys.exit(main())
