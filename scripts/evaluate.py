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
    p.add_argument(
        "--eval-seg-per-batch", action="store_true",
        help="reference-parity per-batch seg-metric averaging (PARITY.md 2.7)",
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
    model_kw = {k: v for k, v in dict(maxdisp=args.maxdisp).items() if v is not None}
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
    results = trainer.evaluate()
    print(results)


if __name__ == "__main__":
    main()
