"""Dataset-correct valid masks and padded-eval exclusion (VERDICT r2
missing #4): the 'positive' policy treats gt==0 as no-gt (KITTI disp-PNG /
WHU convention), so zero-padded eval borders contribute nothing to loss or
metrics; padded labels carry the ignore id and stay out of the confusion
matrix."""

import jax.numpy as jnp
import numpy as np

from semstereo_tpu import metrics
from semstereo_tpu.config import DataConfig
from semstereo_tpu.train.steps import valid_mask


def test_mask_policy_resolution():
    assert DataConfig(dataset="us3d").resolved_mask_policy(True) == "symmetric"
    assert DataConfig(dataset="kitti").resolved_mask_policy(True) == "positive"
    assert DataConfig(dataset="WhuDataset").resolved_mask_policy(False) == "positive"
    assert (
        DataConfig(dataset="us3d", mask_policy="positive").resolved_mask_policy(True)
        == "positive"
    )


def test_positive_mask_excludes_zero_padding():
    gt = np.zeros((1, 8, 10), np.float32)
    gt[0, 2:, :6] = 5.0  # real gt region; borders stay 0 like eval padding
    m = np.asarray(valid_mask(jnp.asarray(gt), 64, "positive"))
    assert m.sum() == 6 * 6
    assert not m[0, :2].any() and not m[0, :, 6:].any()
    # symmetric policy (US3D) counts 0 as a valid disparity value
    ms = np.asarray(valid_mask(jnp.asarray(gt), 64, "symmetric"))
    assert ms.all()


def test_padded_eval_metrics_match_cropped():
    """EPE/D1 on a zero-padded sample (positive policy) == on the cropped
    sample: padding is mask-excluded, reproducing the reference's explicit
    top_pad/right_pad cropping (kitti_dataset_15.py:123-134)."""
    rng = np.random.default_rng(0)
    gt = rng.uniform(1.0, 30.0, (1, 16, 24)).astype(np.float32)
    est = gt + rng.normal(0, 2.0, gt.shape).astype(np.float32)
    top, rightp = 5, 7
    gt_pad = np.pad(gt, ((0, 0), (top, 0), (0, rightp)))
    est_pad = np.pad(est, ((0, 0), (top, 0), (0, rightp)), constant_values=123.0)

    m = valid_mask(jnp.asarray(gt), 64, "positive")
    mp = valid_mask(jnp.asarray(gt_pad), 64, "positive")
    for fn in (metrics.epe_metric, metrics.d1_metric):
        a = float(fn(jnp.asarray(est), jnp.asarray(gt), m))
        b = float(fn(jnp.asarray(est_pad), jnp.asarray(gt_pad), mp))
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_padded_labels_stay_out_of_confusion():
    nc = 19  # real KITTI classes; ignore id == 19 == num_classes
    rng = np.random.default_rng(1)
    labels = rng.integers(0, nc, (1, 8, 8)).astype(np.float32)
    logits = rng.normal(size=(1, 8, 8, nc + 1)).astype(np.float32)
    cm = np.asarray(metrics.confusion_matrix(jnp.asarray(logits), jnp.asarray(labels), nc))
    labels_pad = np.pad(labels, ((0, 0), (3, 0), (0, 4)), constant_values=float(nc))
    logits_pad = np.pad(logits, ((0, 0), (3, 0), (0, 4), (0, 0)))
    cm_pad = np.asarray(
        metrics.confusion_matrix(jnp.asarray(logits_pad), jnp.asarray(labels_pad), nc)
    )
    np.testing.assert_array_equal(cm, cm_pad)


def test_all_reduce_sum_tree_single_process_noop():
    from semstereo_tpu.parallel import all_reduce_sum_tree

    tree = {"a": np.ones((2, 2)), "b": 3}
    out = all_reduce_sum_tree(tree)
    assert out is tree  # identity when process_count() == 1
