"""Evaluation metrics: disparity (EPE / D1 / Thres-k) and segmentation
(confusion-matrix PA / CPA / MPA / IoU / mIoU / FWIoU).

Re-designs /root/reference/utils/metrics.py for TPU: everything is computed
on-device in jnp with static shapes — per-image masked reductions instead of
boolean indexing, and the confusion matrix as a one-hot matmul (MXU) instead
of a host-side bincount.  Per-image degenerate-mask skipping (coverage <10%
of gt>0 pixels, reference metrics.py:16-35) is expressed as a validity
weight so batches stay fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _per_image(metric_elem, mask):
    """Masked per-image mean of an elementwise metric: [B,H,W] -> [B]."""
    m = mask.astype(jnp.float32)
    return jnp.sum(metric_elem * m, axis=(1, 2)) / jnp.maximum(
        jnp.sum(m, axis=(1, 2)), 1.0
    )


def _image_validity(d_gt, mask):
    """1.0 for images whose valid-mask coverage is >=10% of gt>0 pixels."""
    m = jnp.mean(mask.astype(jnp.float32), axis=(1, 2))
    g = jnp.mean((d_gt > 0).astype(jnp.float32), axis=(1, 2))
    return (m / jnp.maximum(g, 1e-12) >= 0.1).astype(jnp.float32)


def _batch_mean(per_image_vals, validity):
    return jnp.sum(per_image_vals * validity) / jnp.maximum(jnp.sum(validity), 1.0)


def epe_metric(d_est, d_gt, mask):
    """Masked mean abs error, averaged over valid images (reference EPE_metric)."""
    err = jnp.abs(d_est - d_gt)
    return _batch_mean(_per_image(err, mask), _image_validity(d_gt, mask))


def d1_metric(d_est, d_gt, mask):
    """Fraction with error >3px AND >5% of |gt| (reference D1_metric)."""
    err = jnp.abs(d_est - d_gt)
    bad = (err > 3.0) & (err / jnp.maximum(jnp.abs(d_gt), 1e-12) > 0.05)
    return _batch_mean(_per_image(bad.astype(jnp.float32), mask), _image_validity(d_gt, mask))


def thres_metric(d_est, d_gt, mask, thres: float):
    """Fraction with error > thres px (reference Thres_metric)."""
    bad = (jnp.abs(d_est - d_gt) > thres).astype(jnp.float32)
    return _batch_mean(_per_image(bad, mask), _image_validity(d_gt, mask))


def confusion_matrix(logits, labels, num_classes: int):
    """Accumulate a [C, C] confusion matrix on-device.

    logits: [B, H, W, C'] (argmax over C'); labels: [B, H, W] ids.
    Rows = gt class, cols = predicted class; pixels with gt >= num_classes
    contribute nothing (the reference counts only classes < numClass via
    bincount truncation).
    """
    pred = jnp.argmax(logits, axis=-1)
    gt = labels.astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes) & (pred < num_classes)
    oh_gt = jax.nn.one_hot(jnp.where(valid, gt, 0), num_classes, dtype=jnp.float32)
    oh_pr = jax.nn.one_hot(jnp.where(valid, pred, 0), num_classes, dtype=jnp.float32)
    w = valid.astype(jnp.float32)[..., None]
    return jnp.einsum("bhwi,bhwj->ij", oh_gt * w, oh_pr)


class SegmentationMeter:
    """Host-side accumulator over jnp/np confusion matrices
    (API-parity with the reference SegmentationMetric, utils/metrics.py:91-213)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.cm = np.zeros((num_classes, num_classes), np.float64)

    def add_batch(self, logits, labels):
        self.cm += np.asarray(confusion_matrix(logits, labels, self.num_classes))

    def add_confusion(self, cm):
        self.cm += np.asarray(cm)

    def pixel_accuracy(self):
        return np.diag(self.cm).sum() / max(self.cm.sum(), 1e-12)

    def class_pixel_accuracy(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.diag(self.cm) / self.cm.sum(axis=1)

    def mean_pixel_accuracy(self):
        return np.nanmean(self.class_pixel_accuracy())

    def iou(self):
        inter = np.diag(self.cm)
        union = self.cm.sum(axis=1) + self.cm.sum(axis=0) - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            return inter / union

    def mean_iou(self):
        return np.nanmean(self.iou())

    def fw_iou(self):
        freq = self.cm.sum(axis=1) / max(self.cm.sum(), 1e-12)
        iu = self.iou()
        sel = freq > 0
        return float((freq[sel] * iu[sel]).sum())

    def reset(self):
        self.cm[:] = 0
