#!/usr/bin/env python
"""Per-op profile of the flagship eval forward at 1024x1024.

Captures a jax.profiler trace of the compiled graph and prints the top HLO
ops by self time (tensorboard_plugin_profile parses the xplane) — the
ground truth for where the milliseconds go, replacing guesswork from
stage-prefix timings.

Usage: python benchmarks/profile_forward.py [--top 40] [--height 1024]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--train", action="store_true", help="profile the train step")
    args = p.parse_args()

    from semstereo_tpu.models import SemStereo

    rng = np.random.default_rng(0)
    h, w = args.height, args.width
    right = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    left = jnp.asarray(np.roll(right, 8, axis=2), jnp.bfloat16)
    right = jnp.asarray(right, jnp.bfloat16)
    model = SemStereo(maxdisp=64, num_classes=6)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
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

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {}
    )
    blob = json.loads(data) if isinstance(data, (str, bytes)) else data
    # hlo_stats: list-of-rows table with fields incl. program/category/
    # occurrences/self time; schema differs by version — locate columns.
    print(json.dumps(blob)[:200])
    rows = blob
    try:
        cols = [c["name"] if isinstance(c, dict) else c for c in rows[0]]
        print(cols)
    except Exception:
        pass
    # Fall back: dump raw for offline inspection
    out_path = "/tmp/hlo_stats.json"
    with open(out_path, "w") as f:
        json.dump(blob, f)
    print("full stats at", out_path)


if __name__ == "__main__":
    main()
