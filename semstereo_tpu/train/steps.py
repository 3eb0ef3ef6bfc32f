"""Jitted train / eval steps: loss assembly per recipe, gradient update,
on-device metrics.

One ``train_step = jit(grad + adam update)`` replaces the reference's
train_sample functions (/root/reference/main_us3d.py:186-222 incl. the
seg+LRSC recipe, main_whu.py:185-215 stereo-only).  Under a sharded batch
the gradient mean over devices is inserted by XLA (GSPMD) — the TPU-native
equivalent of DataParallel's gather + NCCL allreduce.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from semstereo_tpu import losses, metrics
from semstereo_tpu.config import TrainConfig
from semstereo_tpu.train.state import TrainState, build_model, build_optimizer


def _cast_floats(tree, dtype):
    """Cast float32 leaves to `dtype` (no-op for ints/bools)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        tree,
    )


def _compute_dtype(cfg: TrainConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def valid_mask(gt, maxdisp: int, symmetric):
    """Valid-pixel policy (see DataConfig.mask_policy):
    'symmetric' / True: -maxdisp <= d < maxdisp (US3D, main_us3d.py:199-200);
    'positive' / False: 0 < d < maxdisp (WHU main_whu.py:198, and the KITTI
    disp-PNG convention where 0 encodes no-gt, kitti_dataset_15.py:37-40 —
    which also auto-excludes zero-padded eval borders from loss/metrics)."""
    if symmetric in (True, "symmetric"):
        return (gt < maxdisp) & (gt >= -maxdisp)
    return (gt < maxdisp) & (gt > 0)


def _display_gt(gt):
    """Zero the large-negative invalid sentinel before metric display
    (reference main_us3d.py:210)."""
    return jnp.where(gt < -871.0, 0.0, gt)


def assemble_train_loss(cfg: TrainConfig, out, batch):
    model_cfg, loss_cfg = cfg.model, cfg.loss
    gt = batch["disparity"]
    gt4 = batch["disparity_4"]
    policy = cfg.data.resolved_mask_policy(model_cfg.symmetric)
    mask = valid_mask(gt, model_cfg.maxdisp, policy)
    mask4 = valid_mask(gt4, model_cfg.maxdisp, policy)

    disp_ests = out["disp"]
    n = len(disp_ests)
    gts = [gt, gt4, gt, gt4][:n]
    masks = [mask, mask4, mask, mask4][:n]
    weights = losses.DISP_WEIGHTS_FULL[:n]
    disp_loss = losses.disp_loss_train(
        disp_ests, gts, [m.astype(jnp.float32) for m in masks], weights
    )

    total = disp_loss
    aux = {"disp_loss": disp_loss}
    if loss_cfg.use_seg:
        seg = losses.label_loss(
            out["label_l"], batch["label"], model_cfg.num_classes,
            model_cfg.att_weights_only, loss_cfg.ignore_index,
        )
        total = total + seg
        aux["label_loss"] = seg
    if loss_cfg.use_lrsc:
        lr_loss = losses.lrsc_loss(out["label_r"], disp_ests[0], batch["label"])
        total = total + lr_loss
        aux["lrsc_loss"] = lr_loss
    elif loss_cfg.use_lrsc_self:
        pseudo = jnp.argmax(jax.lax.stop_gradient(out["label_l"]), axis=-1).astype(
            jnp.float32
        )
        lr_loss = losses.lrsc_loss(out["label_r"], disp_ests[0], pseudo)
        total = total + lr_loss
        aux["lrsc_loss"] = lr_loss
    aux["loss"] = total
    return total, aux, mask


def make_grads_fn(cfg: TrainConfig, model=None):
    """Returns grads(params, batch_stats, batch) ->
    (grads, (new_batch_stats, aux, out, mask)) — the gradient part of the train
    step, honoring cfg.optim.grad_accum (microbatch scan).  Exposed separately
    so tests can assert the accumulation identity
    ``grads_accum(batch) == mean_i grads_single(microbatch_i)`` exactly."""
    if model is None:
        model = build_model(cfg)
    dtype = _compute_dtype(cfg)

    def loss_fn(params, batch_stats, batch):
        # Mixed precision: fp32 master params, bf16 compute.  The casts are
        # differentiable, so gradients come back fp32.  batch_stats are passed
        # uncast: flax BatchNorm computes batch mean/var in fp32 and the
        # running-average momentum update then stays entirely fp32 (a bf16
        # EMA would quantize the stats to ~0.4% relative each step); BN
        # outputs still land in bf16 because flax canonicalizes the output
        # dtype from (x, scale, bias) only.
        out, mut = model.apply(
            {
                "params": _cast_floats(params, dtype),
                "batch_stats": batch_stats,
            },
            batch["left"].astype(dtype),
            batch["right"].astype(dtype),
            train=True,
            mutable=["batch_stats"],
        )
        out = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), out)
        total, aux, mask = assemble_train_loss(cfg, out, batch)
        return total, (mut["batch_stats"], aux, out, mask)

    accum = max(int(cfg.optim.grad_accum), 1)

    def grads_single(params, batch_stats, batch):
        return jax.grad(loss_fn, has_aux=True)(params, batch_stats, batch)

    def grads_accum(params, batch_stats, batch):
        """Microbatch scan: mean gradient over `accum` chunks of the leading
        axis; BN stats thread through sequentially (matching torch semantics
        where each sub-step updates the running average)."""
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]), batch
        )

        def body(carry, mb):
            bs, acc = carry
            g, (new_bs, aux, out, mask) = jax.grad(loss_fn, has_aux=True)(
                params, bs, mb
            )
            acc = jax.tree_util.tree_map(jnp.add, acc, g)
            return (new_bs, acc), (aux, out, mask)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (new_bs, gsum), (auxs, outs, masks) = jax.lax.scan(
            body, (batch_stats, zeros), micro
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        # report scalars/metrics from the microbatch mean / concatenation
        aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxs)
        out = jax.tree_util.tree_map(
            lambda o: o.reshape(o.shape[0] * o.shape[1], *o.shape[2:]), outs
        )
        mask = masks.reshape(masks.shape[0] * masks.shape[1], *masks.shape[2:])
        return grads, (new_bs, aux, out, mask)

    return grads_single if accum == 1 else grads_accum


def make_train_step(cfg: TrainConfig):
    """Returns train_step(state, batch) -> (state, scalars)."""
    model = build_model(cfg)
    tx = build_optimizer(cfg)
    grads_fn = make_grads_fn(cfg, model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        grads, (new_bs, aux, out, mask) = grads_fn(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gt = _display_gt(batch["disparity"])
        est = out["disp"][0]
        scalars = dict(
            aux,
            EPE=metrics.epe_metric(est, gt, mask),
            D1=metrics.d1_metric(est, gt, mask),
            Thres1=metrics.thres_metric(est, gt, mask, 1.0),
            Thres2=metrics.thres_metric(est, gt, mask, 2.0),
            Thres3=metrics.thres_metric(est, gt, mask, 3.0),
        )
        return (
            state.replace(params=new_params, batch_stats=new_bs, opt_state=new_opt),
            scalars,
        )

    return train_step


def make_eval_step(cfg: TrainConfig):
    """Returns eval_step(state, batch) -> scalars dict (+ confusion matrix
    under key 'confusion' when segmentation is on)."""
    model = build_model(cfg)
    model_cfg = cfg.model
    seg_on = model_cfg.seg_if
    dtype = _compute_dtype(cfg)
    policy = cfg.data.resolved_mask_policy(model_cfg.symmetric)

    @jax.jit
    def eval_step(state: TrainState, batch):
        out = model.apply(
            {
                "params": _cast_floats(state.params, dtype),
                "batch_stats": state.batch_stats,
            },
            batch["left"].astype(dtype),
            batch["right"].astype(dtype),
            train=False,
        )
        out = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), out)
        has_gt = "disparity" in batch  # static per trace: batches without
        # ground truth (KITTI/Cityscapes test rows, kitti_dataset_15.py:
        # 123-150) run inference-only — estimates out, no metrics.
        scalars: dict[str, Any] = {}
        if "disp" in out:
            est = out["disp"][0]
            scalars["disp_est"] = est
            if has_gt:
                gt = batch["disparity"]
                mask = valid_mask(gt, model_cfg.maxdisp, policy)
                scalars["disp_loss"] = losses.disp_loss_eval(
                    est, gt, mask.astype(jnp.float32)
                )
                gtd = _display_gt(gt)
                scalars.update(
                    EPE=metrics.epe_metric(est, gtd, mask),
                    D1=metrics.d1_metric(est, gtd, mask),
                    Thres1=metrics.thres_metric(est, gtd, mask, 1.0),
                    Thres2=metrics.thres_metric(est, gtd, mask, 2.0),
                    Thres3=metrics.thres_metric(est, gtd, mask, 3.0),
                )
        if seg_on and "label" in batch:
            scalars["label_loss"] = losses.label_loss(
                out["label_l"], batch["label"], model_cfg.num_classes,
                model_cfg.att_weights_only, cfg.loss.ignore_index,
            )
            scalars["confusion"] = metrics.confusion_matrix(
                out["label_l"], batch["label"], model_cfg.num_classes - 1
            )
        elif seg_on:
            scalars["label_est"] = jnp.argmax(out["label_l"], axis=-1)
        if "disp" in out and has_gt:
            scalars["loss"] = scalars["disp_loss"] + scalars.get("label_loss", 0.0)
        return scalars

    return eval_step
