#!/usr/bin/env python
"""Scaling harness.

Two modes (round-5 rework of the r4 harness whose numbers were artifacts —
virtual-CPU "efficiency" measured 2-vCPU oversubscription and the 1-chip
entry measured tunnel dispatch, VERDICT r4 weak #4):

--mode weak-scaling   Data-parallel weak scaling over 1..N devices (fixed
                      per-device batch).  MEANINGFUL ONLY ON A MULTI-CHIP
                      SLICE: with one real device it prints the 1-chip entry
                      and says so; --cpu runs the machinery on a virtual
                      8-device mesh for plumbing validation (its efficiency
                      numbers reflect host oversubscription, not collectives).

--mode sharding-overhead   A number one chip CAN answer: the cost of the
                      disp/space sharding constraints themselves.  Runs the
                      train step on a 1-device mesh with and without the
                      volume sharding annotations (semstereo.py
                      _constrain_disp) at the same shape and reports the
                      delta — the price of leaving the multi-chip levers ON
                      in single-chip deployments.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(args, shard_disp=False, shard_spatial=False):
    from semstereo_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )

    small = args.maxdisp <= 16
    return TrainConfig(
        model=ModelConfig(
            maxdisp=args.maxdisp,
            topk=4 if small else 24,
            att_window1=(1, 2, 2) if small else (4, 4, 4),
            att_window2=(1, 2, 2) if small else (6, 4, 4),
            shard_disp=shard_disp,
            shard_spatial=shard_spatial,
            remat=args.remat,
        ),
        data=DataConfig(),
        optim=OptimConfig(),
        loss=LossConfig(use_seg=True, use_lrsc=True),
        compute_dtype=args.dtype,
    )


def make_batch(jnp, bs, h, w):
    return {
        "left": jnp.zeros((bs, h, w, 3), jnp.float32),
        "right": jnp.zeros((bs, h, w, 3), jnp.float32),
        "disparity": jnp.full((bs, h, w), 3.0),
        "disparity_4": jnp.full((bs, h // 4, w // 4), 3.0),
        "label": jnp.zeros((bs, h, w)),
    }


def time_step(jax, jnp, train_step, state, batch, steps):
    def sync(s):
        leaf = jax.tree_util.tree_leaves(s.params)[0]
        return float(jnp.sum(leaf).astype(jnp.float32))

    state, _ = train_step(state, batch)  # compile
    sync(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, _ = train_step(state, batch)
    sync(state)
    return (time.perf_counter() - t0) / steps


def weak_scaling(args, jax, jnp):
    from semstereo_tpu.parallel import make_mesh, shard_batch
    from semstereo_tpu.train import init_state, make_train_step

    n = len(jax.devices())
    if n == 1:
        print(json.dumps({
            "note": "single device: weak scaling not measurable; the 1-chip "
            "step time below is the baseline a multi-chip run would divide by. "
            "Use --mode sharding-overhead for a 1-chip-answerable question."
        }))
    cfg = build_cfg(args)
    train_step = make_train_step(cfg)
    base = None
    for nd in [s for s in (1, 2, 4, 8, 16, 32) if s <= n]:
        mesh = make_mesh(data=nd, disp=1, devices=jax.devices()[:nd])
        bs = args.per_device_batch * nd
        state = init_state(cfg, (bs, args.height, args.width, 3))
        batch = shard_batch(mesh, make_batch(jnp, bs, args.height, args.width))
        dt = time_step(jax, jnp, train_step, state, batch, args.steps)
        sps = bs / dt
        base = base or sps
        print(json.dumps({
            "devices": nd,
            "global_batch": bs,
            "step_ms": round(dt * 1e3, 2),
            "samples_per_sec": round(sps, 3),
            "scaling_efficiency": round(sps / (base * nd), 4),
        }))


def sharding_overhead(args, jax, jnp):
    from semstereo_tpu.parallel import make_mesh, shard_batch
    from semstereo_tpu.train import init_state, make_train_step

    mesh = make_mesh(data=1, disp=1, space=1, devices=jax.devices()[:1])
    out = {}
    for label, (sd, ss) in (
        ("plain", (False, False)),
        ("disp+space_constraints", (True, True)),
    ):
        cfg = build_cfg(args, shard_disp=sd, shard_spatial=ss)
        step = make_train_step(cfg)
        bs = args.per_device_batch
        with jax.sharding.set_mesh(mesh):
            state = init_state(cfg, (bs, args.height, args.width, 3))
            batch = shard_batch(mesh, make_batch(jnp, bs, args.height, args.width))
            dt = time_step(jax, jnp, step, state, batch, args.steps)
        out[label] = dt
        print(json.dumps({
            "variant": label, "step_ms": round(dt * 1e3, 2),
            "pairs_per_sec": round(bs / dt, 3),
        }))
    ovh = out["disp+space_constraints"] / out["plain"] - 1.0
    print(json.dumps({
        "metric": "sharding_constraint_overhead_1chip",
        "overhead_pct": round(100 * ovh, 2),
        "note": "cost of leaving the volume-sharding levers enabled on a "
        "single chip (GSPMD resolves the axes to size 1)",
    }))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="weak-scaling",
                   choices=["weak-scaling", "sharding-overhead"])
    p.add_argument("--cpu", action="store_true", help="virtual 8-device CPU mesh")
    p.add_argument("--per-device-batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--maxdisp", type=int, default=64)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--remat", nargs="?", const="full", default=False)
    args = p.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    if args.mode == "weak-scaling":
        weak_scaling(args, jax, jnp)
    else:
        sharding_overhead(args, jax, jnp)


if __name__ == "__main__":
    main()
