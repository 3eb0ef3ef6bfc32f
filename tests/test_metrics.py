"""Metric parity vs torch/numpy oracles re-deriving
/root/reference/utils/metrics.py."""

import numpy as np
import torch

from semstereo_tpu import metrics


def oracle_per_image(metric, est, gt, mask):
    """Reference compute_metric_for_each_image wrapper (metrics.py:16-35)."""
    vals = []
    for i in range(gt.shape[0]):
        if mask[i].mean() / max((gt[i] > 0).mean(), 1e-12) < 0.1:
            continue
        vals.append(metric(est[i][mask[i]], gt[i][mask[i]]))
    return float(np.mean(vals)) if vals else 0.0


def make_data(rng, b=3):
    gt = rng.uniform(-20, 60, (b, 16, 16)).astype(np.float32)
    est = gt + rng.standard_normal((b, 16, 16)).astype(np.float32) * 4
    mask = (gt > -10) & (gt < 50)
    # one degenerate image: nearly empty mask
    mask[1] = False
    mask[1, 0, 0] = True
    gt[1] = np.abs(gt[1])
    return est, gt, mask


def test_epe_matches_oracle(rng):
    est, gt, mask = make_data(rng)
    ref = oracle_per_image(lambda e, g: np.abs(e - g).mean(), est, gt, mask)
    out = float(metrics.epe_metric(est, gt, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_d1_matches_oracle(rng):
    est, gt, mask = make_data(rng)

    def d1(e, g):
        err = np.abs(e - g)
        return ((err > 3) & (err / np.abs(g) > 0.05)).mean()

    ref = oracle_per_image(d1, est, gt, mask)
    out = float(metrics.d1_metric(est, gt, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_thres_matches_oracle(rng):
    est, gt, mask = make_data(rng)
    ref = oracle_per_image(lambda e, g: (np.abs(e - g) > 2.0).mean(), est, gt, mask)
    out = float(metrics.thres_metric(est, gt, mask, 2.0))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_confusion_matrix_matches_bincount(rng):
    b, h, w, nc = 2, 8, 8, 5
    logits = rng.standard_normal((b, h, w, nc + 1)).astype(np.float32)
    labels = rng.integers(0, nc + 1, (b, h, w))  # includes out-of-range class 5

    # Oracle: bincount over gt*C + pred like the reference (metrics.py:143-168)
    # but *excluding* pixels whose argmax hits the ignore class.  The reference
    # feeds 6-channel logits into a 5-class matrix, so `gt*5 + pred` aliases
    # pred=5 into the next row's column 0 — a counting bug we deliberately fix
    # (SURVEY.md section 2.7 spirit); gt >= C pixels are dropped by both.
    pred = np.argmax(logits, axis=-1)
    keep = (labels < nc) & (pred < nc)
    idx = (labels[keep] * nc + pred[keep]).astype(np.int64)
    counts = np.bincount(idx, minlength=nc * nc)
    ref = counts[: nc * nc].reshape(nc, nc)

    cm = np.asarray(metrics.confusion_matrix(logits, labels, nc))
    np.testing.assert_array_equal(cm, ref)


def test_segmentation_meter_stats():
    meter = metrics.SegmentationMeter(3)
    cm = np.array([[5, 1, 0], [0, 4, 0], [2, 0, 8]], np.float64)
    meter.add_confusion(cm)
    np.testing.assert_allclose(meter.pixel_accuracy(), 17 / 20)
    iou = meter.iou()
    np.testing.assert_allclose(iou, [5 / 8, 4 / 5, 8 / 10])
    np.testing.assert_allclose(meter.mean_iou(), np.mean([5 / 8, 4 / 5, 8 / 10]))
    cpa = meter.class_pixel_accuracy()
    np.testing.assert_allclose(cpa, [5 / 6, 1.0, 8 / 10])


def test_per_batch_seg_aggregation_matches_reference_semantics():
    """eval_seg_per_batch mode (PARITY.md section 2.7 item 7): per-batch
    metric values averaged NaN-aware over batches — the reference's
    aggregation (test_us3d.py:120-125) — differs from the global-matrix
    default exactly when batches have different class mixes."""
    from semstereo_tpu.train.trainer import _seg_scalars
    from semstereo_tpu.utils.experiment import AverageMeterDictPerKey

    cm1 = np.array([[8, 0, 0], [1, 3, 0], [0, 0, 0]], np.float64)  # class 2 absent
    cm2 = np.array([[2, 0, 0], [0, 6, 1], [0, 2, 9]], np.float64)

    meter = AverageMeterDictPerKey()
    meter.update(_seg_scalars(cm1, 3))
    meter.update(_seg_scalars(cm2, 3))
    got = meter.mean()

    def miou(cm):
        inter = np.diag(cm)
        union = cm.sum(1) + cm.sum(0) - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.nanmean(inter / union)

    # per-batch: mean of the two batch mIoUs (batch1's NaN class skipped
    # inside its own mIoU, like the reference's nanmean-per-batch)
    want = np.mean([miou(cm1), miou(cm2)])
    np.testing.assert_allclose(got["mIoU"], want)
    # and it differs from the global-matrix value on this data
    assert abs(got["mIoU"] - miou(cm1 + cm2)) > 1e-3
    # IoU2 was NaN in batch 1 -> averaged over batch 2 only
    np.testing.assert_allclose(got["IoU2"], 9 / 12)
