"""Train state: params + BN batch stats + Adam optimizer state.

Replaces the reference's Adam + per-epoch piecewise LR decay
(/root/reference/main_us3d.py:102,131 and utils/experiment.py:102-120).  The
learning rate lives in ``optax.inject_hyperparams`` state so the trainer can
set the reference's epoch-indexed schedule without retracing the step.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from semstereo_tpu.config import TrainConfig, lr_for_epoch
from semstereo_tpu.models import __models__


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0


def build_model(cfg: TrainConfig):
    model_cls = __models__[cfg.model.name]
    return model_cls(
        maxdisp=cfg.model.maxdisp,
        num_classes=cfg.model.num_classes,
        att_weights_only=cfg.model.att_weights_only,
        seg_if=cfg.model.seg_if,
        stereo_if=cfg.model.stereo_if,
        topk=cfg.model.topk,
        refine_topk=cfg.model.refine_topk,
        cost_volume_impl=cfg.model.cost_volume_impl,
        att_window1=cfg.model.att_window1,
        att_window2=cfg.model.att_window2,
        # volume sharding constraints auto-activate with their mesh axes
        shard_disp=cfg.model.shard_disp or cfg.parallel.disp > 1,
        shard_spatial=cfg.model.shard_spatial or cfg.parallel.space > 1,
        remat=cfg.model.remat,
    )


def build_optimizer(cfg: TrainConfig):
    adam = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.optim.lr, b1=cfg.optim.betas[0], b2=cfg.optim.betas[1]
    )
    if cfg.optim.grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.optim.grad_clip), adam)
    return adam


def init_state(cfg: TrainConfig, sample_shape: tuple[int, int, int, int]) -> TrainState:
    """Initialize params/batch_stats with a dummy batch of `sample_shape`
    (B, H, W, C) and a fresh optimizer state."""
    model = build_model(cfg)
    dummy = jnp.zeros(sample_shape, jnp.float32)
    # jitted init: eager init is thousands of per-op dispatches (minutes
    # through a remote-device tunnel); one compiled+cached program instead.
    variables = jax.jit(
        lambda d: model.init(jax.random.PRNGKey(cfg.seed), d, d, train=False)
    )(dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if cfg.model.pretrained_backbone:
        from semstereo_tpu.utils.timm_convert import load_and_merge

        bp, bs, n = load_and_merge(
            cfg.model.pretrained_backbone,
            params["feature"],
            batch_stats.get("feature", {}),
        )
        params = dict(params, feature=bp)
        if batch_stats:
            batch_stats = dict(batch_stats, feature=bs)
        print(f"loaded pretrained backbone: {n} leaves from "
              f"{cfg.model.pretrained_backbone}")
    tx = build_optimizer(cfg)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        epoch=0,
    )


def set_learning_rate(state: TrainState, cfg: TrainConfig, epoch: int) -> TrainState:
    """Apply the reference's epoch-indexed piecewise-constant decay."""
    lr = lr_for_epoch(cfg.optim.lr, epoch, cfg.optim.lrepochs)

    def with_lr(opt_state):
        # inject_hyperparams state directly, or nested inside an optax.chain
        # tuple when grad_clip is enabled.
        if hasattr(opt_state, "hyperparams"):
            hyper = dict(opt_state.hyperparams)
            hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return opt_state._replace(hyperparams=hyper)
        assert isinstance(opt_state, tuple), type(opt_state)
        return tuple(
            with_lr(s) if hasattr(s, "hyperparams") else s for s in opt_state
        )

    return state.replace(opt_state=with_lr(state.opt_state))


def merge_partial_params(current, loaded):
    """Filtered partial load: keep loaded leaves whose path+shape match the
    current tree (reference stage-1 -> stage-2 warm start,
    /root/reference/main_us3d.py:116-123)."""
    cur_flat, treedef = jax.tree_util.tree_flatten_with_path(current)
    loaded_flat = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged = []
    n_loaded = 0
    for path, leaf in cur_flat:
        cand = loaded_flat.get(path)
        if cand is not None and tuple(cand.shape) == tuple(leaf.shape):
            merged.append(jnp.asarray(cand, leaf.dtype))
            n_loaded += 1
        else:
            merged.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, merged), n_loaded
