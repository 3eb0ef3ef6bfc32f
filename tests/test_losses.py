"""Loss parity vs torch oracles (reference /root/reference/models/loss.py)."""

import numpy as np
import torch
import torch.nn.functional as F

from semstereo_tpu import losses


def test_smooth_l1_pyramid_matches_torch(rng):
    ests = [rng.standard_normal((2, 8, 8)).astype(np.float32) for _ in range(4)]
    gts = [rng.standard_normal((2, 8, 8)).astype(np.float32) for _ in range(4)]
    masks = [rng.random((2, 8, 8)) > 0.3 for _ in range(4)]
    ref = sum(
        w * F.smooth_l1_loss(torch.from_numpy(e)[torch.from_numpy(m)],
                             torch.from_numpy(g)[torch.from_numpy(m)])
        for e, g, w, m in zip(ests, gts, (1.0, 0.6, 0.5, 0.3), masks)
    ).item()
    out = losses.disp_loss_train(ests, gts, [m.astype(np.float32) for m in masks])
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_cross_entropy_ignore_matches_torch(rng):
    logits = rng.standard_normal((2, 6, 6, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 6, 6))
    labels[0, 0] = 4  # make sure ignore class present
    ref = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels),
        ignore_index=4,
    ).item()
    out = losses.cross_entropy(logits, labels, ignore_index=4)
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def torch_dice(logits, labels, num_classes, ignore=5):
    """Oracle re-derivation of reference dice_loss (loss.py:51-63)."""
    inp = F.softmax(torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))), dim=1)
    tgt = F.one_hot(torch.from_numpy(labels).long(), num_classes).permute(0, 3, 1, 2).float()
    inp, tgt = inp[:, :-1], tgt[:, :-1]
    inp, tgt = inp.flatten(0, 1), tgt.flatten(0, 1)
    inter = 2 * (inp * tgt).sum(dim=(-1, -2))
    sets = inp.sum(dim=(-1, -2)) + tgt.sum(dim=(-1, -2))
    sets = torch.where(sets == 0, inter, sets)
    dice = (inter + 1e-6) / (sets + 1e-6)
    return (1 - dice.mean()).item()


def test_dice_loss_matches_reference(rng):
    logits = rng.standard_normal((2, 6, 6, 6)).astype(np.float32)
    labels = rng.integers(0, 6, (2, 6, 6))
    ref = torch_dice(logits, labels, 6)
    out = losses.dice_loss(logits, labels, 6, ignore_index=5)
    np.testing.assert_allclose(float(out), ref, rtol=1e-4)


def test_label_loss_scales():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
    labels = rng.integers(0, 5, (1, 4, 4))
    l1 = float(losses.label_loss(logits, labels, 6, attention_weights_only=True))
    l2 = float(losses.label_loss(logits, labels, 6, attention_weights_only=False))
    np.testing.assert_allclose(l2 / l1, 2.4 / 1.6, rtol=1e-6)


def test_lrsc_loss_matches_torch(rng):
    b, h, w, nc = 2, 5, 9, 6
    logits_r = rng.standard_normal((b, h, w, nc)).astype(np.float32)
    disp = rng.uniform(-2, 6, (b, h, w)).astype(np.float32)
    label = rng.integers(0, 6, (b, h, w)).astype(np.float32)

    # torch oracle (loss.py:121-135)
    y = torch.from_numpy(label).unsqueeze(1)
    xc = torch.arange(w).view(1, 1, w).expand(b, h, w)
    xd = torch.clamp(xc - torch.from_numpy(disp), 0, w - 1)
    warped = torch.gather(y, 3, xd.unsqueeze(1).long()).squeeze(1)
    ref = F.cross_entropy(
        torch.from_numpy(np.transpose(logits_r, (0, 3, 1, 2))), warped.long(),
        ignore_index=-1,
    ).item()

    out = losses.lrsc_loss(logits_r, disp, label)
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_empty_mask_gives_zero_not_nan():
    est = np.ones((1, 4, 4), np.float32)
    gt = np.zeros((1, 4, 4), np.float32)
    mask = np.zeros((1, 4, 4), np.float32)
    out = losses.disp_loss_train([est], [gt], [mask], weights=(1.0,))
    assert float(out) == 0.0
