"""Benchmark docs are ARTIFACT-LOCKED: the generated blocks in README.md
and docs/ROADMAP.md must match what scripts/render_bench_docs.py renders
from the cited BENCH_r*.json — three rounds of hand-typed numbers drifted
from the driver artifact (VERDICT r2-r4); this pins them at commit time."""

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_docs_match_cited_artifact():
    readme = (REPO / "README.md").read_text()
    m = re.search(r"GENERATED from (BENCH_r\d+\.json)", readme)
    assert m, "README.md lost its generated bench block"
    artifact = m.group(1)
    assert (REPO / artifact).exists(), artifact
    proc = subprocess.run(
        [sys.executable, "scripts/render_bench_docs.py", artifact, "--check"],
        cwd=REPO, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
