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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    h, w = args.height, args.width
    left = jnp.zeros((1, h, w, 3), dtype)
    right = jnp.zeros((1, h, w, 3), dtype)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v
        )

    results = {}

    # 1. backbone alone (x2: both views)
    bb = MobileViTv2Backbone()
    vb = cast(bb.init(jax.random.PRNGKey(0), left))
    results["backbone_x2"] = timed_calibrated(
        lambda l, r: bb.apply(vb, l)[0] + bb.apply(vb, r)[0], (left, right)
    )

    # 2. seg-only model (backbone x2 + FeatUp + heads)
    m_seg = SemStereo(maxdisp=64, stereo_if=False)
    vs = cast(m_seg.init(jax.random.PRNGKey(0), left, right))
    results["seg_graph"] = timed_calibrated(
        lambda l, r: m_seg.apply(vs, l, r)["label_l"], (left, right)
    )

    # 3. stage-1 (attention-weights-only) full graph
    m_s1 = SemStereo(maxdisp=64, att_weights_only=True)
    v1 = cast(m_s1.init(jax.random.PRNGKey(0), left, right))
    results["stage1_graph"] = timed_calibrated(
        lambda l, r: m_s1.apply(v1, l, r)["disp"][0], (left, right)
    )

    # 4. full stage-2 graph
    m_s2 = SemStereo(maxdisp=64)
    v2 = cast(m_s2.init(jax.random.PRNGKey(0), left, right))
    results["full_graph"] = timed_calibrated(
        lambda l, r: m_s2.apply(v2, l, r)["disp"][0], (left, right)
    )

    out = {k: round(v * 1e3, 2) for k, v in results.items()}
    out["delta_featup_heads"] = round(out["seg_graph"] - out["backbone_x2"], 2)
    out["delta_stage1"] = round(out["stage1_graph"] - out["seg_graph"], 2)
    out["delta_stage2_refine"] = round(out["full_graph"] - out["stage1_graph"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
