#!/usr/bin/env python
"""Run the test suite and write a TESTS_r{N}.json round artifact so test
claims are as auditable as the BENCH/MULTICHIP/COPYCHECK artifacts
(round-3 advisor finding: the fast-suite pass count was the one headline
verification result with no committed evidence).

Usage: python scripts/emit_test_artifact.py <round> [pytest markexpr]
  e.g. python scripts/emit_test_artifact.py 4 "not slow"
"""

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    markexpr = sys.argv[2] if len(sys.argv) > 2 else "not slow"
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "-m", markexpr]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-15:]
    summary = next(
        (l for l in reversed(tail) if re.search(r"\d+ (passed|failed|error)", l)),
        tail[-1] if tail else "",
    )
    counts = {
        k: int(m.group(1))
        for k in ("passed", "failed", "error", "skipped", "deselected")
        if (m := re.search(rf"(\d+) {k}", summary))
    }
    artifact = {
        "round": rnd,
        "cmd": " ".join(cmd[1:]),
        "rc": proc.returncode,
        "summary": summary.strip(),
        "counts": counts,
        "wall_s": round(wall, 1),
    }
    out = REPO / f"TESTS_r{rnd:02d}.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
