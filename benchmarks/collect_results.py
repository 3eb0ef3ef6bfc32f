#!/usr/bin/env python
"""Collect benchmark results into one committed artifact (results_r4.json).

Runs each harness as a subprocess (fresh process => honest compile-cache
behavior), parses its JSON lines, and merges into benchmarks/results_rN.json
with the exact command recorded per entry.  Incremental: --only reruns one
section and merges over the existing file, so TPU time can be spent
piecewise.

Usage:
  python benchmarks/collect_results.py --round 4 [--only roofline] [--tag note]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SECTIONS = {
    "bench_eval_default": [sys.executable, "bench.py"],
    "bench_eval_pallas_conv3d": [sys.executable, "bench.py"],  # env below
    "bench_eval_pallas_cv": [sys.executable, "bench.py", "--cost-volume", "pallas"],
    "roofline": [sys.executable, "benchmarks/roofline.py"],
    "model_breakdown": [sys.executable, "benchmarks/model_breakdown.py"],
    "train_step_b4": [sys.executable, "benchmarks/train_step.py", "--batch", "4"],
    "train_step_b4_remat": [
        sys.executable, "benchmarks/train_step.py", "--batch", "4", "--remat",
    ],
    "scaling": [sys.executable, "benchmarks/scaling.py"],
    # multi-device scaling on the virtual CPU mesh (1 real chip available);
    # tiny config — the point is collective/sharding overhead, not FLOPs
    "scaling_cpu8": [
        sys.executable, "benchmarks/scaling.py", "--cpu", "--maxdisp", "16",
        "--height", "32", "--width", "32",
    ],
}
ENVS = {"bench_eval_pallas_conv3d": {"SEMSTEREO_PALLAS_CONV3D": "1"}}


def run_section(name: str, timeout: int) -> dict:
    cmd = SECTIONS[name]
    env = dict(os.environ, **ENVS.get(name, {}))
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=ROOT, env=env, capture_output=True, text=True, timeout=timeout
        )
        rc = proc.returncode
        out = proc.stdout
        err = proc.stderr[-2000:]
    except subprocess.TimeoutExpired as e:
        rc, out, err = -1, (e.stdout or ""), f"TIMEOUT after {timeout}s"
    lines = []
    for ln in out.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    entry = {
        "cmd": " ".join(
            [f"{k}={v}" for k, v in ENVS.get(name, {}).items()] + cmd
        ).replace(sys.executable, "python"),
        "rc": rc,
        "wall_s": round(time.time() - t0, 1),
        "results": lines,
    }
    if rc != 0:
        entry["stderr_tail"] = err
    return entry


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, default=4)
    p.add_argument("--only", action="append", choices=sorted(SECTIONS))
    p.add_argument("--timeout", type=int, default=2400, help="per-section seconds")
    p.add_argument("--tag", default="")
    args = p.parse_args()

    path = os.path.join(ROOT, "benchmarks", f"results_r{args.round}.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    doc.setdefault("meta", {}).update(
        {"updated": time.strftime("%Y-%m-%d %H:%M:%S"), "commit": commit}
    )
    if args.tag:
        doc["meta"]["tag"] = args.tag

    for name in args.only or list(SECTIONS):
        print(f"== {name} ==", flush=True)
        doc[name] = run_section(name, args.timeout)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(doc[name])[:400], flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
