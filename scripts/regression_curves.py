#!/usr/bin/env python
"""mAP-vs-steps regression curves for the e2e learning demos.

Runs the BEV and SECOND demos at several training lengths and records the
final official-metric mAP for each, as a learning-progress regression
artifact (ROADMAP validation plan). Writes docs/curves.json.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STEPS = [60, 150, 300]


def run_demo(script: str, steps: int, out: Path, extra=()) -> dict:
    # FRESH work dir every time: the demos auto-resume from an existing
    # model_dir (the torchplus checkpoint semantics), so a stale dir from
    # an earlier sweep silently turns "train N steps" into "load the old
    # checkpoint and eval" — which invalidated one r5 curve re-run.
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    cmd = [sys.executable, str(REPO / "scripts" / script),
           "--steps", str(steps), "--out", str(out), *extra]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"{script} --steps {steps} produced no JSON line\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated curve keys to (re)run; existing "
                         "keys in docs/curves.json are preserved")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    work = Path("/tmp/lyft3d_curves")
    out = REPO / "docs" / "curves.json"
    curves = json.loads(out.read_text()) if out.exists() else {}
    for script, key, extra in [
        ("demo_bev_e2e.py", "bev_unet", ()),
        ("demo_second_e2e.py", "second_voxelnet", ()),
        ("demo_second_e2e.py", "second_voxelnet_sparse", ("--sparse",)),
        ("demo_pointrcnn_e2e.py", "pointrcnn_refined", ()),
    ]:
        if only is not None and key not in only:
            continue
        curves[key] = []
        for steps in STEPS:
            try:
                r = run_demo(script, steps, work / f"{key}_{steps}", extra)
                point = {"steps": steps, "mAP": r.get("mAP"),
                         "wall_s": r.get("wall_s")}
                if "ap_bev@0.5_refined" in r:
                    point["ap_refined"] = r["ap_bev@0.5_refined"]
                    point["ap_proposals"] = r["ap_bev@0.5_proposals"]
            except Exception as e:  # record and keep the sweep going
                point = {"steps": steps, "error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{key} @ {steps} steps: {point}", flush=True)
            curves[key].append(point)
    out.write_text(json.dumps(curves, indent=2))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
