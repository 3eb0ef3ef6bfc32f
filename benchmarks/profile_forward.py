#!/usr/bin/env python
"""Per-op profile of the flagship eval forward at 1024x1024.

Captures a jax.profiler trace of the compiled graph and aggregates the
device-track events from the perfetto trace.json.gz by HLO-op name prefix —
the ground truth for where the milliseconds go, replacing guesswork from
stage-prefix timings.

Usage: python benchmarks/profile_forward.py [--top 40] [--height 1024]
Prints one JSON line: {"total_ms_per_iter": ..., "top": [[name, ms, pct], ...]}
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def aggregate_trace(logdir: str, iters: int, top: int) -> dict:
    """Sum device-lane event durations by op-name stem from the perfetto
    trace; the TPU device track pids are identified by process name."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace.json.gz under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        doc = json.load(f)
    events = doc["traceEvents"]
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    # thread names like "XLA Op" / "Steps" vary; keep all X-phase events on
    # device pids except obvious non-op lanes.
    by_op: dict[str, float] = defaultdict(float)
    by_stem: dict[str, float] = defaultdict(float)
    by_src: dict[str, float] = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # skip the whole-program wrapper event (double-counts everything
        # beneath it) and step/bookkeeping lanes
        if name.startswith(("Steps", "prog", "run_", "jit_", "tpu_")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        kind = re.sub(r"[.\d]+$", "", name)
        by_stem[kind] += dur
        # source attribution: XLA op events carry the python op path in args
        # (long_name / tf_op); bucket copies & fusions by it so the
        # ms-per-model-layer is readable without HLO-id cross-matching
        a = e.get("args", {}) or {}
        src = a.get("long_name") or a.get("tf_op") or a.get("name") or ""
        src = re.sub(r"[\d.]+", "", src)[:120] if src else f"<{kind}>"
        by_src[f"{kind} @ {src}"] += dur
        total += dur
    rank = lambda d, n: sorted(d.items(), key=lambda kv: -kv[1])[:n]
    fmt = lambda kv: [kv[0], round(kv[1] / iters, 3), round(100 * kv[1] / total, 1)]
    return {
        "total_device_ms_per_iter": round(total / iters, 3),
        "top_ops": [fmt(kv) for kv in rank(by_op, top)],
        "by_kind": [fmt(kv) for kv in rank(by_stem, 15)],
        "by_source": [fmt(kv) for kv in rank(by_src, top)],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument(
        "--cost-volume", default="auto", choices=["auto", "xla", "pallas"]
    )
    p.add_argument("--keep", action="store_true", help="keep the trace dir")
    args = p.parse_args()

    from semstereo_tpu.models import SemStereo

    rng = np.random.default_rng(0)
    h, w = args.height, args.width
    right = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    left = jnp.asarray(np.roll(right, 8, axis=2), jnp.bfloat16)
    right = jnp.asarray(right, jnp.bfloat16)
    model = SemStereo(maxdisp=64, num_classes=6, cost_volume_impl=args.cost_volume)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, train=False)
    )(left, right)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )

    fwd = jax.jit(lambda l, r: model.apply(variables, l, r, train=False)["disp"][0])

    def sync(x):
        return float(jnp.sum(x).astype(jnp.float32))

    sync(fwd(left, right))
    sync(fwd(left, right))

    logdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(args.iters):
            out = fwd(left, right)
        sync(out)

    stats = aggregate_trace(logdir, args.iters, args.top)
    if args.keep:
        stats["trace_dir"] = logdir
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
