"""Training losses: multi-scale disparity, segmentation (CE + dice), and the
LRSC explicit semantic-consistency loss.

Re-designs /root/reference/models/loss.py.  All losses are masked means
implemented as sum(loss * mask) / sum(mask) so they jit with static shapes;
empty masks yield 0 instead of the reference's NaN (documented deviation).

Label logits are channels-last [B, H, W, C]; targets are [B, H, W] class ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semstereo_tpu.ops.warp import lrsc_label_warp

# Pyramid weights for (full-res refined, 1/4 refined, full-res att, 1/4 att)
# — /root/reference/models/loss.py:20.
DISP_WEIGHTS_FULL = (1.0, 0.6, 0.5, 0.3)
DISP_WEIGHTS_ATT = (1.0, 0.6)


def _masked_mean(x, mask):
    denom = jnp.sum(mask)
    return jnp.sum(x * mask) / jnp.maximum(denom, 1.0)


def smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def disp_loss_train(disp_ests, disp_gts, masks, weights=None):
    """Weighted smooth-L1 pyramid (reference model_loss_train)."""
    if weights is None:
        weights = DISP_WEIGHTS_FULL[: len(disp_ests)]
    total = 0.0
    for est, gt, w, m in zip(disp_ests, disp_gts, weights, masks):
        total = total + w * _masked_mean(smooth_l1(est, gt), m)
    return total


def disp_loss_eval(disp_est, disp_gt, mask):
    """Masked L1 on the single eval output (reference model_loss_test)."""
    return _masked_mean(jnp.abs(disp_est - disp_gt), mask)


def cross_entropy(logits, labels, ignore_index: int | None = None):
    """Mean CE over non-ignored pixels; logits [B,H,W,C], labels [B,H,W]."""
    labels = labels.astype(jnp.int32)
    valid = (
        jnp.ones(labels.shape, bool)
        if ignore_index is None
        else labels != ignore_index
    )
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, valid.astype(nll.dtype))


def dice_loss(logits, labels, num_classes: int, ignore_index: int | None = 5):
    """Multiclass soft dice, dropping the ignore (last) class
    (reference dice_loss/multiclass_dice_coeff, loss.py:33-67).

    Per (batch*class) dice over spatial dims, averaged, eps=1e-6; pairs whose
    union is 0 get dice = 1 (the reference's sets_sum==0 -> inter swap).

    ignore_index inside [0, num_classes) drops that class channel (the
    reference's US3D case: ignore 5 == last of 6); an out-of-range id
    (KITTI/Cityscapes 255) instead masks the ignored pixels out of the union
    (one_hot already zeroes them in the intersection)."""
    prob = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=prob.dtype)
    if ignore_index is not None and 0 <= ignore_index < num_classes:
        keep = [i for i in range(num_classes) if i != ignore_index]
        prob = prob[..., keep]
        onehot = onehot[..., keep]
    elif ignore_index is not None:
        valid = (labels != ignore_index)[..., None].astype(prob.dtype)
        prob = prob * valid
    inter = 2.0 * jnp.sum(prob * onehot, axis=(1, 2))  # [B, C']
    sets = jnp.sum(prob, axis=(1, 2)) + jnp.sum(onehot, axis=(1, 2))
    sets = jnp.where(sets == 0, inter, sets)
    dice = (inter + 1e-6) / (sets + 1e-6)
    return 1.0 - jnp.mean(dice)


def label_loss(logits, labels, num_classes: int, attention_weights_only: bool,
               ignore_index: int = 5):
    """(CE(ignore) + dice) x 1.6 (stage 1) or x 2.4 (stage 2)
    (reference model_label_loss, loss.py:106-119)."""
    loss = cross_entropy(logits, labels, ignore_index) + dice_loss(
        logits, labels, num_classes, ignore_index
    )
    return loss * (1.6 if attention_weights_only else 2.4)


def lrsc_loss(label_logits_r, disp_est, label_gt_l):
    """Left-right semantic consistency: warp the left GT label map to the
    right view by the predicted full-res disparity and supervise the right
    seg head (reference LRSC_loss, loss.py:121-135).

    No gradient flows through the integer warp (the gather index is
    non-differentiable), matching torch semantics where .long() detaches.
    """
    warped = lrsc_label_warp(label_gt_l, jax.lax.stop_gradient(disp_est))
    return cross_entropy(label_logits_r, warped, ignore_index=None)


def focal_loss(logits, labels, gamma: float = 2.0, ignore_index: int = -1):
    """Focal loss (parity with the reference's unused focal_loss,
    loss.py:69-104, simplified to the standard multiclass form)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes)
    if ignore_index >= 0:
        onehot = onehot.at[..., ignore_index].set(0.0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    focal = -onehot * ((1 - p) ** gamma) * logp
    return jnp.mean(jnp.sum(focal, axis=-1))
