#!/usr/bin/env python
"""End-to-end stage breakdown of the flagship forward at 1024x1024.

Measures cumulative prefixes of the real graph and reports the deltas:
backbone -> +FeatUp+heads -> +stage1 (cost volume/hourglass/topk) -> full.
Timing: plain loop of N dispatches between scalar-fetch syncs — the ~25 ms
tunnel RTT amortizes to ~1 ms/iter error, fine at the 10-80 ms stage scale
(the scan-calibrated harness is reserved for micro-kernels; its scan compiles
take minutes per stage at this graph size)."""

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

from semstereo_tpu.models import SemStereo  # noqa: E402
from semstereo_tpu.nn import MobileViTv2Backbone  # noqa: E402


STAGES = ("backbone_x2", "seg_graph", "stage1_graph", "full_graph")


def timed_loop(fn, args, iters: int = 20, warmup: int = 3) -> float:
    """Wall-clock seconds per call: `iters` dispatches between syncs."""
    import jax.numpy as _jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(_jnp.sum(leaf).astype(_jnp.float32))

    jfn = jax.jit(fn)
    sync(jfn(*args))
    for _ in range(warmup):
        out = jfn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def measure(stage: str, h: int, w: int, dtype) -> float:
    import numpy as _np

    rng = _np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, h, w, 3)), dtype)
    right = jnp.asarray(rng.standard_normal((1, h, w, 3)), dtype)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v
        )

    if stage == "backbone_x2":
        bb = MobileViTv2Backbone()
        vb = cast(jax.jit(lambda l: bb.init(jax.random.PRNGKey(0), l))(left))
        return timed_loop(
            lambda l, r: bb.apply(vb, l)[0] + bb.apply(vb, r)[0], (left, right)
        )
    if stage == "seg_graph":
        m = SemStereo(maxdisp=64, stereo_if=False)
        v = cast(jax.jit(lambda l, r: m.init(jax.random.PRNGKey(0), l, r))(left, right))
        return timed_loop(
            lambda l, r: m.apply(v, l, r)["label_l"], (left, right)
        )
    if stage == "stage1_graph":
        m = SemStereo(maxdisp=64, att_weights_only=True)
        v = cast(jax.jit(lambda l, r: m.init(jax.random.PRNGKey(0), l, r))(left, right))
        return timed_loop(
            lambda l, r: m.apply(v, l, r)["disp"][0], (left, right)
        )
    m = SemStereo(maxdisp=64)
    v = cast(jax.jit(lambda l, r: m.init(jax.random.PRNGKey(0), l, r))(left, right))
    return timed_loop(lambda l, r: m.apply(v, l, r)["disp"][0], (left, right))


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
