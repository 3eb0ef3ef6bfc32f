"""Orbax checkpointing: save/restore {epoch, params, batch_stats, opt_state}
with latest-step resume and filtered partial restore.

TPU-native equivalent of the reference's torch.save dict + glob-latest resume
+ filtered stage-1 -> stage-2 partial load (/root/reference/main_us3d.py:105-123,
:151-154).  Multi-host safe: every host restores the same step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from semstereo_tpu.train.state import TrainState, merge_partial_params


def _manager(logdir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(logdir),
        options=ocp.CheckpointManagerOptions(create=True, max_to_keep=None),
    )


def save_checkpoint(logdir: str, state: TrainState, epoch: int) -> None:
    mgr = _manager(logdir)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(logdir: str) -> Optional[int]:
    if not os.path.isdir(logdir):
        return None
    mgr = _manager(logdir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(logdir: str, state: TrainState, epoch: Optional[int] = None) -> TrainState:
    """Full exact-structure restore (the --resume path)."""
    mgr = _manager(logdir)
    step = epoch if epoch is not None else mgr.latest_step()
    assert step is not None, f"no checkpoints in {logdir}"
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
    )
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        epoch=step + 1,
    )


def restore_partial(logdir: str, state: TrainState, epoch: Optional[int] = None) -> tuple[TrainState, int]:
    """Filtered partial load: merge any leaf whose path+shape matches
    (stage-1 attention-only checkpoint into the full stage-2 model).
    Returns (state, number_of_leaves_loaded)."""
    mgr = _manager(logdir)
    step = epoch if epoch is not None else mgr.latest_step()
    assert step is not None, f"no checkpoints in {logdir}"
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    params, n1 = merge_partial_params(state.params, restored["params"])
    bstats, n2 = merge_partial_params(state.batch_stats, restored["batch_stats"])
    return state.replace(params=params, batch_stats=bstats), n1 + n2
