#!/usr/bin/env python
"""Training-step benchmark at the US3D production shape (what the
reference's 2-GPU main_us3d.py loop does all day): full stage-2 graph,
1024x1024 tiles, seg+LRSC losses, Adam update.

Usage: python benchmarks/train_step.py [--batch 4] [--remat] [--height 1024]
Prints one JSON line with step time, pairs/s and HBM headroom.
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument(
        "--remat", nargs="?", const="full", default=False,
        help="bare flag = full (backbone+hourglasses); or a comma-set of "
        "backbone,featup,hourglass,concat,spx (e.g. --remat featup)",
    )
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = p.parse_args()

    from semstereo_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from semstereo_tpu.train import init_state, make_train_step

    remat = True if args.remat == "full" else (args.remat or False)
    cfg = TrainConfig(
        model=ModelConfig(maxdisp=64, num_classes=6, remat=remat),
        data=DataConfig(batch_size=args.batch),
        optim=OptimConfig(lr=1e-3),
        loss=LossConfig(use_seg=True, use_lrsc=True),
        compute_dtype=args.dtype,
    )
    b, h, w = args.batch, args.height, args.width
    rng = np.random.default_rng(0)
    right = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    batch = {
        "left": jnp.asarray(np.roll(right, 8, axis=2)),
        "right": jnp.asarray(right),
        "disparity": jnp.asarray(
            rng.uniform(-30, 30, (b, h, w)).astype(np.float32)
        ),
        "disparity_4": jnp.asarray(
            rng.uniform(-30, 30, (b, h // 4, w // 4)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(0, 5, (b, h, w)).astype(np.float32)
        ),
    }
    state = init_state(cfg, (b, h, w, 3))
    step = make_train_step(cfg)

    def sync(s):
        leaf = jax.tree_util.tree_leaves(s.params)[0]
        return float(jnp.sum(leaf).astype(jnp.float32))

    state, scalars = step(state, batch)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, scalars = step(state, batch)
    sync(state)
    dt = (time.perf_counter() - t0) / args.iters

    mem = {}
    try:
        ms = jax.devices()[0].memory_stats()
        mem = {
            "hbm_peak_gib": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2),
            "hbm_limit_gib": round(ms.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        pass
    # MFU vs the v5e bf16 MXU peak (197 TF/s, benchmarks/roofline.py:34-36):
    # model FLOPs from the compiled executable's own cost analysis (same HLO
    # as the timed step, so .compile() is a cache hit).
    try:
        ca = step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = 197e12 if args.dtype == "bfloat16" else 98.5e12
        mem["model_tflops_per_step"] = round(flops / 1e12, 2)
        mem["mfu_pct"] = round(100.0 * flops / dt / peak, 1)
    except Exception as e:
        mem["mfu_error"] = str(e)[:120]
    print(json.dumps({
        "metric": f"train_step_{h}x{w}_b{b}"
        + (f"_remat[{args.remat}]" if args.remat else ""),
        "step_ms": round(dt * 1e3, 1),
        "pairs_per_sec": round(args.batch / dt, 3),
        "loss": round(float(scalars["loss"]), 4),
        **mem,
    }))


if __name__ == "__main__":
    main()
