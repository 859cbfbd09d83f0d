"""Measure the Gloo 2-process cluster's flake base rate (idle machine).

CLAUDE.md documents the multiprocess gate as "~10-25% flaky when anything
else runs concurrently" — folklore from before the control-plane barriers
+ prewarm + run-first ordering landed. This loop runs the full
tests/test_multiprocess.py gate N times back-to-back on an (ideally idle)
machine and records, per run: pass/fail, wall seconds, and how many
rendezvous retries the fixture consumed (parsed from the "[dist] cluster
converged after N retries" line the fixture prints). The summary is the
measured post-fix base rate to cite in docs/RESULTS.md and CLAUDE.md.

    python tools/gloo_flake_loop.py [N]        # default 10
"""

import json
import os
import re
import subprocess
import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    root = os.path.join(os.path.dirname(__file__), "..")
    runs = []
    for i in range(n):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest",
                 "tests/test_multiprocess.py", "-q", "-s"],
                capture_output=True, text=True, cwd=root, timeout=900,
            )
            out = r.stdout + r.stderr
            ok = r.returncode == 0
        except subprocess.TimeoutExpired as e:
            # a hung run IS a failure (the documented Gloo-wedge mode) —
            # count it and keep measuring instead of losing the loop
            out = "".join(s if isinstance(s, str)
                          else (s or b"").decode("utf-8", "replace")
                          for s in (e.stdout, e.stderr))
            out += "\n[gloo_flake_loop] TIMEOUT after 900 s"
            ok = False
        wall = time.time() - t0
        # the fixture prints the retry line to stderr (pytest -s passes it
        # through); search both streams
        m = re.search(r"converged after (\d+) retries", out)
        retries = int(m.group(1)) if m else None
        load1 = round(os.getloadavg()[0], 2)
        runs.append({"run": i + 1, "ok": ok, "wall_s": round(wall, 1),
                     "retries": retries, "load1": load1})
        print(f"run {i + 1}/{n}: {'PASS' if ok else 'FAIL'} "
              f"{wall:.0f}s retries={retries} load={load1}", flush=True)
        if not ok:
            runs[-1]["tail"] = out[-2000:]
            print(out[-2000:], flush=True)

    fails = sum(1 for r in runs if not r["ok"])
    tot_retries = sum(r["retries"] or 0 for r in runs if r["retries"] is not None)
    summary = {
        "runs": n,
        "failures": fails,
        "fail_rate": fails / n,
        "total_retries": tot_retries,
        "host_cpus": os.cpu_count(),
        "runs_detail": runs,
    }
    out = os.path.join(root, "docs", "gloo_flake_runs.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{n} runs: {fails} failures ({100 * fails / n:.0f}%), "
          f"{tot_retries} total rendezvous retries -> {out}")


if __name__ == "__main__":
    main()
