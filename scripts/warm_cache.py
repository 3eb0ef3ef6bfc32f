#!/usr/bin/env python
"""Precompile the standard benchmark graph set into the persistent XLA cache
(/root/.jax_cache), so measurement runs stop paying the 14-22-minute
cold-compile tax per HLO variant through the remote-compile tunnel
(VERDICT r4 weak #8 / next #9).

Each graph is warmed by invoking the EXACT harness that measures it with a
minimal iteration count — the cache key covers the whole HLO including
constant-folded parameters, so only the identical program text hits.

    python scripts/warm_cache.py              # default: eval + train graphs
    python scripts/warm_cache.py --set all    # + the A/B variant matrix
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVAL = [["bench.py", "--iters", "1", "--warmup", "0"]]
TRAIN = [
    ["benchmarks/train_step.py", "--batch", "1", "--iters", "1"],
    ["benchmarks/train_step.py", "--batch", "2", "--iters", "1", "--remat"],
]
AB = [
    ["bench.py", "--iters", "1", "--warmup", "0", "--cost-volume", "pallas"],
    ["bench.py", "--iters", "1", "--warmup", "0", "--warp", "onehot"],
    ["bench.py", "--iters", "1", "--warmup", "0", "--fuse-views"],
    ["bench.py", "--iters", "1", "--warmup", "0", "--batch", "2"],
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--set", default="default", choices=["default", "eval", "train", "all"])
    p.add_argument("--timeout", type=int, default=3600, help="per-graph seconds")
    args = p.parse_args()

    groups = {
        "eval": EVAL,
        "train": TRAIN,
        "default": EVAL + TRAIN,
        "all": EVAL + TRAIN + AB,
    }[args.set]
    failures = 0
    for cmd in groups:
        full = [sys.executable, os.path.join(REPO, cmd[0]), *cmd[1:]]
        t0 = time.time()
        print("+", " ".join(cmd), flush=True)
        try:
            r = subprocess.run(
                full, cwd=REPO, timeout=args.timeout, capture_output=True, text=True
            )
            status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
            if r.returncode != 0:
                failures += 1
                sys.stderr.write(r.stderr[-2000:])
        except subprocess.TimeoutExpired:
            status = "timeout"
            failures += 1
        print(f"  {status} in {time.time() - t0:.0f}s", flush=True)
    print(f"warm_cache done ({failures} failures)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
