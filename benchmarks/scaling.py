#!/usr/bin/env python
"""Scaling-efficiency harness: train-step throughput at 1..N devices.

Measures data-parallel weak scaling (fixed per-device batch) of the jitted
train step over sub-meshes of the available devices.  On a single real chip
this reports the 1-chip number; pass --cpu to validate the scaling machinery
on a virtual 8-device CPU mesh (the driver dry-runs multichip the same way).

Prints one JSON line per mesh size with samples/s and efficiency vs 1 device.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="virtual 8-device CPU mesh")
    p.add_argument("--per-device-batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--maxdisp", type=int, default=64)
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

    from semstereo_tpu.config import (
        DataConfig,
        LossConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from semstereo_tpu.parallel import make_mesh, shard_batch
    from semstereo_tpu.train import init_state, make_train_step

    n = len(jax.devices())
    small = args.maxdisp <= 16
    cfg = TrainConfig(
        model=ModelConfig(
            maxdisp=args.maxdisp,
            topk=4 if small else 24,
            att_window1=(1, 2, 2) if small else (4, 4, 4),
            att_window2=(1, 2, 2) if small else (6, 4, 4),
        ),
        data=DataConfig(),
        optim=OptimConfig(),
        loss=LossConfig(use_seg=True, use_lrsc=True),
    )
    train_step = make_train_step(cfg)

    base = None
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    for nd in sizes:
        mesh = make_mesh(data=nd, disp=1, devices=jax.devices()[:nd])
        bs = args.per_device_batch * nd
        h, w = args.height, args.width
        state = init_state(cfg, (bs, h, w, 3))
        batch = shard_batch(
            mesh,
            {
                "left": jnp.zeros((bs, h, w, 3), jnp.float32),
                "right": jnp.zeros((bs, h, w, 3), jnp.float32),
                "disparity": jnp.full((bs, h, w), 3.0),
                "disparity_4": jnp.full((bs, h // 4, w // 4), 3.0),
                "label": jnp.zeros((bs, h, w)),
            },
        )
        def sync(s):
            leaf = jax.tree_util.tree_leaves(s.params)[0]
            return float(jnp.sum(leaf).astype(jnp.float32))

        state, _ = train_step(state, batch)  # compile
        sync(state)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, scalars = train_step(state, batch)
        sync(state)
        dt = (time.perf_counter() - t0) / args.steps
        sps = bs / dt
        if base is None:
            base = sps
        print(
            json.dumps(
                {
                    "devices": nd,
                    "global_batch": bs,
                    "step_ms": round(dt * 1e3, 2),
                    "samples_per_sec": round(sps, 3),
                    "scaling_efficiency": round(sps / (base * nd), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
