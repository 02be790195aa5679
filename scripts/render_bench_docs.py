#!/usr/bin/env python
"""Render README/ROADMAP benchmark numbers from a named BENCH_r*.json.

Three consecutive rounds of VERDICT flagged hand-typed benchmark claims
drifting from the driver's canonical artifact (in-session runs differ by
±3% from the driver run). This script makes the docs ARTIFACT-LOCKED:
every current-run number lives inside marker-delimited blocks that are
regenerated wholesale from the cited artifact, never hand-edited.

Usage:
    python scripts/render_bench_docs.py BENCH_r04.json           # rewrite
    python scripts/render_bench_docs.py BENCH_r04.json --check   # verify

``--check`` exits non-zero if either file's generated block differs from
what the artifact renders (used by tests/test_bench_docs.py to pin the
docs to the artifact at commit time).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

BEGIN = "<!-- bench:begin"
END = "<!-- bench:end -->"


def load_detail(artifact: Path):
    data = json.loads(artifact.read_text())
    parsed = data["parsed"] if "parsed" in data else data
    d = dict(parsed.get("detail", {}))
    d["headline_value"] = parsed["value"]
    d["headline_metric"] = parsed["metric"]
    return d


def _fmt(x, nd=1):
    return f"{x:.{nd}f}" if x is not None else "—"


def render_block(d: dict, artifact_name: str) -> str:
    mfu = d.get("mfu", {})

    def pct(key):
        e = mfu.get(key)
        return f"{100 * e['mfu_vs_bf16_peak']:.1f}%" if e else "—"

    cpu = d.get("cpu_baseline_sweeps_per_sec")
    flag = d["headline_value"]
    b = d.get("batch", "?")
    if "reference_parity_unet_seresnext101_sweeps_per_sec" in d:
        # r5+ artifacts: flagship = TPU-optimal resnet50 (re-baselined,
        # ROADMAP ceiling note); seresnext101 = reference-parity row.
        second = d["reference_parity_unet_seresnext101_sweeps_per_sec"]
        head_rows = [
            (f"flagship resnet50-UNet BEV e2e (TPU-optimal, batch {b}, "
             "folded-BN)",
             f"**{_fmt(flag)} sweeps/s**", pct("flagship_resnet50"),
             f"{flag / cpu:.0f}×" if cpu else "—"),
            ("seresnext101-UNet (reference-parity model), same pipeline",
             f"**{_fmt(second)} sweeps/s**",
             pct("reference_parity_seresnext101"),
             f"{second / cpu:.0f}×" if (second and cpu) else "—"),
        ]
    else:
        # r<=4 artifacts: flagship = seresnext101.
        second = d.get("tpu_optimal_variant_unet_resnet50_sweeps_per_sec")
        head_rows = [
            (f"flagship seresnext101-UNet BEV e2e (batch {b}, folded-BN)",
             f"**{_fmt(flag)} sweeps/s**", pct("flagship_seresnext101"),
             f"{flag / cpu:.0f}×" if cpu else "—"),
            ("resnet50-UNet (TPU-optimal dense variant), same pipeline",
             f"**{_fmt(second)} sweeps/s**", "—",
             f"{second / cpu:.0f}×" if (second and cpu) else "—"),
        ]
    rows = [
        *head_rows,
        ("SECOND pillars e2e "
         f"({d.get('voxelnet_points_per_sample', 0) // 1000}k pts, Lyft "
         "9-class)",
         f"**{_fmt(d.get('voxelnet_lyft9_e2e_samples_per_sec'))} "
         "samples/s**", pct("voxelnet_pillars"), "—"),
        ("SECOND sparse-FHD e2e (SpMiddleFHD path, true FHD geometry)",
         f"**{_fmt(d.get('voxelnet_sparse_fhd_e2e_samples_per_sec'))} "
         "samples/s**", pct("voxelnet_sparse_fhd"), "—"),
        (f"PointRCNN two-stage e2e (batch {d.get('pointrcnn_batch', '?')})",
         f"**{_fmt(d.get('pointrcnn_lyft_e2e_samples_per_sec'))} "
         "samples/s**", pct("pointrcnn"), "—"),
        ("BEV train step (loss+grad+update, microbatch 8)",
         f"**{_fmt(d.get('bev_train_step_ms'))} ms**", pct("bev_train_step"),
         "—"),
        ("sparse-FHD train step (batch 2)",
         f"**{_fmt(d.get('sparse_train_step_ms'))} ms**",
         pct("sparse_train_step"), "—"),
    ]
    lines = [
        f"{BEGIN} — GENERATED from {artifact_name} by "
        "scripts/render_bench_docs.py; do not hand-edit -->",
        "",
        f"Source artifact: `{artifact_name}` (driver bench run, "
        f"device {d.get('device', '?')}).",
        "",
        "| benchmark | value | MFU (bf16 peak) | vs CPU reference |",
        "|---|---|---|---|",
    ]
    for name, val, m, ratio in rows:
        lines.append(f"| {name} | {val} | {m} | {ratio} |")
    lines += ["", END]
    return "\n".join(lines)


def splice(text: str, block: str, path: Path) -> str:
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        raise SystemExit(f"{path}: no {BEGIN} ... {END} block found")
    return pat.sub(lambda _: block, text, count=1)


def main(argv):
    if not argv or argv[0].startswith("-"):
        raise SystemExit(__doc__)
    artifact = REPO / argv[0]
    check = "--check" in argv[1:]
    d = load_detail(artifact)
    block = render_block(d, artifact.name)
    rc = 0
    for rel in ("README.md", "docs/ROADMAP.md"):
        path = REPO / rel
        text = path.read_text()
        new = splice(text, block, path)
        if check:
            if new != text:
                print(f"DRIFT: {rel} generated block != {artifact.name}")
                rc = 1
            else:
                print(f"ok: {rel} matches {artifact.name}")
        elif new != text:
            path.write_text(new)
            print(f"rewrote {rel} from {artifact.name}")
        else:
            print(f"{rel} already current")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
