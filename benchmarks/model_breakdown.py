#!/usr/bin/env python
"""End-to-end stage breakdown of the flagship forward at 1024x1024.

Per-dispatch fixed costs through the TPU tunnel (~25 ms RTT) drown per-layer
microbenchmarks, so this measures cumulative prefixes of the real graph with
two-point scan calibration (T(n2)-T(n1))/(n2-n1) and reports the deltas:
backbone -> +FeatUp+heads -> +stage1 (cost volume/hourglass/topk) -> full.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks._timing import timed_calibrated  # noqa: E402
from semstereo_tpu.models import SemStereo  # noqa: E402
from semstereo_tpu.nn import MobileViTv2Backbone  # noqa: E402


STAGES = ("backbone_x2", "seg_graph", "stage1_graph", "full_graph")


def measure(stage: str, h: int, w: int, dtype) -> float:
    left = jnp.zeros((1, h, w, 3), dtype)
    right = jnp.zeros((1, h, w, 3), dtype)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v
        )

    if stage == "backbone_x2":
        bb = MobileViTv2Backbone()
        vb = cast(bb.init(jax.random.PRNGKey(0), left))
        return timed_calibrated(
            lambda l, r: bb.apply(vb, l)[0] + bb.apply(vb, r)[0], (left, right)
        )
    if stage == "seg_graph":
        m = SemStereo(maxdisp=64, stereo_if=False)
        v = cast(m.init(jax.random.PRNGKey(0), left, right))
        return timed_calibrated(
            lambda l, r: m.apply(v, l, r)["label_l"], (left, right)
        )
    if stage == "stage1_graph":
        m = SemStereo(maxdisp=64, att_weights_only=True)
        v = cast(m.init(jax.random.PRNGKey(0), left, right))
        return timed_calibrated(
            lambda l, r: m.apply(v, l, r)["disp"][0], (left, right)
        )
    m = SemStereo(maxdisp=64)
    v = cast(m.init(jax.random.PRNGKey(0), left, right))
    return timed_calibrated(lambda l, r: m.apply(v, l, r)["disp"][0], (left, right))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument(
        "--stage", default=None, choices=STAGES,
        help="measure a single prefix graph (one compile per process; the "
        "persistent jit cache accumulates across invocations)",
    )
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    stages = [args.stage] if args.stage else list(STAGES)
    out = {}
    for s in stages:
        out[s + "_ms"] = round(measure(s, args.height, args.width, dtype) * 1e3, 2)
    if len(stages) == len(STAGES):
        out["delta_featup_heads"] = round(out["seg_graph_ms"] - out["backbone_x2_ms"], 2)
        out["delta_stage1"] = round(out["stage1_graph_ms"] - out["seg_graph_ms"], 2)
        out["delta_stage2_refine"] = round(out["full_graph_ms"] - out["stage1_graph_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
