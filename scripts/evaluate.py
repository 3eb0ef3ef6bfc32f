#!/usr/bin/env python
"""Standalone evaluation CLI (replaces the reference's test_us3d.py).

    python scripts/evaluate.py --preset us3d_stage2 --loadckpt checkpoints/us3d_stage2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some environments force a platform programmatically at interpreter startup
# (beating the JAX_PLATFORMS env var); SEMSTEREO_PLATFORM re-overrides it
# before the backend initializes (e.g. =cpu for a virtual test mesh).
if os.environ.get("SEMSTEREO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SEMSTEREO_PLATFORM"])

# Persistent jit cache, shared with scripts/train.py (keyed by backend+HLO).
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from semstereo_tpu.config import PRESETS
from semstereo_tpu.train import checkpoint as ckpt
from semstereo_tpu.train.trainer import Trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="us3d_stage2", choices=sorted(PRESETS))
    p.add_argument("--datapath")
    p.add_argument("--testlist")
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--batch-size", type=int)
    p.add_argument(
        "--maxdisp", type=int,
        help="must match the checkpoint's training maxdisp",
    )
    p.add_argument("--topk", type=int, help="must match the training topk")
    p.add_argument("--att-window1", help="must match training (D,H,W e.g. 1,2,2)")
    p.add_argument("--att-window2", help="must match training (D,H,W e.g. 1,2,2)")
    p.add_argument(
        "--eval-seg-per-batch", action="store_true",
        help="reference-parity per-batch seg-metric averaging (PARITY.md 2.7)",
    )
    p.add_argument(
        "--save-dir",
        help="dump per-sample disparity (256*uint16 PNG) and label maps here; "
        "works on ground-truth-less test lists (inference-only mode)",
    )
    args = p.parse_args()

    cfg = PRESETS[args.preset]
    data_kw = {
        k: v
        for k, v in dict(
            datapath=args.datapath, testlist=args.testlist,
            test_batch_size=args.batch_size,
        ).items()
        if v is not None
    }
    def _win(s):
        return None if s is None else tuple(int(x) for x in s.split(","))

    model_kw = {
        k: v
        for k, v in dict(
            maxdisp=args.maxdisp, topk=args.topk,
            att_window1=_win(args.att_window1), att_window2=_win(args.att_window2),
        ).items()
        if v is not None
    }
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, **data_kw),
        model=dataclasses.replace(cfg.model, **model_kw),
        **({"eval_seg_per_batch": True} if args.eval_seg_per_batch else {}),
    )

    trainer = Trainer(cfg)
    assert trainer.eval_loader is not None, "test list not found"
    first = next(iter(trainer.eval_loader))
    trainer.initialize(sample_shape=first["left"].shape)
    trainer.state = ckpt.restore_checkpoint(args.loadckpt, trainer.state)
    results = trainer.evaluate(save_dir=args.save_dir)
    print(results)


if __name__ == "__main__":
    main()
