#!/usr/bin/env python
"""Unified training CLI (replaces the reference's main_us3d.py / main_whu.py).

    python scripts/train.py --preset us3d_stage1 --datapath ... --trainlist ...
    python scripts/train.py --preset us3d_stage2 --loadckpt checkpoints/us3d_stage1

Presets carry the full recipe (model flags, losses, LR schedule); any flag
given here overrides the preset.  Booleans are real booleans — the
reference's string-typed flags (SURVEY.md section 2.7 item 1) are gone.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some environments force a platform programmatically at interpreter startup
# (beating the JAX_PLATFORMS env var); SEMSTEREO_PLATFORM re-overrides it
# before the backend initializes (e.g. =cpu for a virtual test mesh).
if os.environ.get("SEMSTEREO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SEMSTEREO_PLATFORM"])

# Persistent jit cache (entries are keyed by backend+HLO, so one dir serves
# TPU and CPU runs alike): repeat invocations skip the 20-40s (TPU) /
# minutes (tunnel) compile.
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from semstereo_tpu.config import PRESETS
from semstereo_tpu.train.trainer import Trainer
from semstereo_tpu.utils import TeeLogger


def maybe_init_distributed():
    """Multi-host bring-up: when launched under a multi-process coordinator
    (env JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU pod runtime that auto-detects), initialize jax.distributed so hosts
    form one global mesh over ICI/DCN."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        import jax

        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="us3d_stage2", choices=sorted(PRESETS))
    p.add_argument("--datapath")
    p.add_argument("--trainlist")
    p.add_argument("--testlist")
    p.add_argument("--logdir")
    p.add_argument("--loadckpt", help="partial warm-start checkpoint dir")
    p.add_argument(
        "--pretrained-backbone",
        help="torch mobilevitv2_100 state_dict (.pth) for the backbone "
        "(loud leaf-complete conversion; reference SemStereo.py:37)",
    )
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--lrepochs")
    p.add_argument("--batch-size", type=int)
    p.add_argument(
        "--grad-accum", type=int,
        help="microbatches per optimizer step (activation-memory relief)",
    )
    p.add_argument(
        "--grad-clip", type=float,
        help="global-norm gradient clip (0 = off, reference parity)",
    )
    p.add_argument("--maxdisp", type=int)
    p.add_argument("--topk", type=int, help="cost-volume top-k plane selection")
    p.add_argument(
        "--att-window1", help="stage-1 attention window D,H,W (e.g. 1,2,2)"
    )
    p.add_argument(
        "--att-window2", help="stage-2 attention window D,H,W (e.g. 1,2,2)"
    )
    p.add_argument("--test-batch-size", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--save-freq", type=int, help="epochs between checkpoints")
    p.add_argument("--num-workers", type=int)
    p.add_argument("--data-parallel", type=int, default=-1, help="mesh data axis size")
    p.add_argument("--disp-parallel", type=int, default=1, help="mesh disp axis size")
    p.add_argument(
        "--space-parallel", type=int, default=1,
        help="mesh spatial axis size (height-tile sharding + halo exchange)",
    )
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument(
        "--compute-dtype", choices=["float32", "bfloat16"],
        help="model compute precision (fp32 master params either way)",
    )
    p.add_argument(
        "--remat", nargs="?", const="full",
        help="rematerialization policy: bare flag = 'full' (backbone + 3-D "
        "hourglasses); or a comma-set of backbone,featup,hourglass,concat,spx "
        "for targeted memory relief (e.g. --remat featup)",
    )
    args = p.parse_args()

    maybe_init_distributed()
    cfg = PRESETS[args.preset]
    data_kw = {
        k: v
        for k, v in dict(
            datapath=args.datapath,
            trainlist=args.trainlist,
            testlist=args.testlist,
            batch_size=args.batch_size,
            test_batch_size=args.test_batch_size,
            num_workers=args.num_workers,
        ).items()
        if v is not None
    }
    optim_kw = {
        k: v
        for k, v in dict(
            lr=args.lr, epochs=args.epochs, lrepochs=args.lrepochs,
            grad_accum=args.grad_accum, grad_clip=args.grad_clip,
        ).items()
        if v is not None
    }
    def _win(s):
        return None if s is None else tuple(int(x) for x in s.split(","))

    model_kw = {
        k: v
        for k, v in dict(
            maxdisp=args.maxdisp, pretrained_backbone=args.pretrained_backbone,
            topk=args.topk, att_window1=_win(args.att_window1),
            att_window2=_win(args.att_window2),
        ).items()
        if v is not None
    }
    if args.remat:
        model_kw["remat"] = True if args.remat == "full" else args.remat
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, **data_kw),
        optim=dataclasses.replace(cfg.optim, **optim_kw),
        model=dataclasses.replace(cfg.model, **model_kw),
        parallel=dataclasses.replace(
            cfg.parallel, data=args.data_parallel, disp=args.disp_parallel,
            space=args.space_parallel,
        ),
        **{
            k: v
            for k, v in dict(
                logdir=args.logdir, loadckpt=args.loadckpt, seed=args.seed,
                save_freq=args.save_freq,
            ).items()
            if v is not None
        },
        resume=args.resume,
        **(
            {"compute_dtype": args.compute_dtype}
            if args.compute_dtype is not None
            else {}
        ),
    )

    os.makedirs(cfg.logdir, exist_ok=True)
    sys.stdout = TeeLogger(os.path.join(cfg.logdir, "log.log"))

    writer = None
    if args.tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(cfg.logdir)

    print(f"config: {cfg}")
    Trainer(cfg, writer=writer).train()


if __name__ == "__main__":
    main()
