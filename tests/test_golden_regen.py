"""Live-reference golden regeneration gate (slow).

Re-runs every tools/gen_golden*.py against the reference checkout and
asserts the regenerated fixtures are bit-identical to the committed
tests/golden/* files. This converts the whole parity story from "pinned
once by generator tools that might themselves be wrong" into "re-derivable
on demand": a generator bug (like the r3 double-layer-norm in
extract_clip_text) now fails loudly instead of agreeing with its own
fixture. Skipped wherever /root/reference isn't checked out.
"""

import os
import subprocess
import sys

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout"),
]


def test_goldens_rederive_from_live_reference():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "regen_goldens.py"),
         "--check"],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"golden regeneration mismatch:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-2000:]}")
    assert "all fixtures re-derived" in proc.stdout
