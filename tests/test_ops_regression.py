"""Soft-argmin / variance / top-k ops vs torch oracles re-deriving
/root/reference/models/submodule.py:164-170, :257-263, :434-442 and
/root/reference/models/SemStereo.py:298-310."""

import numpy as np
import torch
import torch.nn.functional as F

from semstereo_tpu.ops import (
    disparity_regression,
    disparity_variance,
    regression_topk,
    topk_planes,
)


def test_disparity_regression_symmetric(rng):
    b, d, h, w = 2, 8, 3, 5
    x = rng.standard_normal((b, d, h, w)).astype(np.float32)
    prob = np.asarray(torch.softmax(torch.from_numpy(x), dim=1))
    vals = torch.arange(-4, 4, dtype=torch.float32).view(1, 8, 1, 1)
    ref = (torch.from_numpy(prob) * vals).sum(1).numpy()
    out = np.asarray(disparity_regression(prob, symmetric=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_disparity_regression_positive(rng):
    b, d, h, w = 1, 6, 2, 4
    prob = rng.random((b, d, h, w)).astype(np.float32)
    vals = np.arange(6, dtype=np.float32).reshape(1, 6, 1, 1)
    ref = (prob * vals).sum(1)
    out = np.asarray(disparity_regression(prob, symmetric=False))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_disparity_variance(rng):
    b, d, h, w = 2, 8, 3, 5
    prob = rng.random((b, d, h, w)).astype(np.float32)
    disp = rng.standard_normal((b, h, w)).astype(np.float32)
    vals = np.arange(-4, 4, dtype=np.float32).reshape(1, 8, 1, 1)
    ref = (prob * (vals - disp[:, None]) ** 2).sum(1)
    out = np.asarray(disparity_variance(prob, disp, symmetric=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_topk_planes_matches_sort_gather(rng):
    b, d, h, w, k = 2, 8, 3, 4, 5
    weights = rng.standard_normal((b, d, h, w)).astype(np.float32)

    wt = torch.from_numpy(weights).unsqueeze(1)  # [B,1,D,H,W]
    prob = F.softmax(wt, dim=2)
    _, ind = prob.sort(2, True)
    ind_k = ind[:, :, :k].sort(2, False)[0]
    ref_prob = torch.gather(prob, 2, ind_k).squeeze(1).numpy()
    ref_raw = torch.gather(wt, 2, ind_k).squeeze(1).numpy()
    ref_samples = (ind_k.squeeze(1).float() - d // 2).numpy()

    topk_prob, topk_raw, samples = topk_planes(weights, k, symmetric=True)
    np.testing.assert_allclose(np.asarray(topk_prob), ref_prob, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(topk_raw), ref_raw, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(samples), ref_samples)


def test_regression_topk_matches_reference(rng):
    b, d, h, w, k = 2, 6, 3, 4, 2
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    samples = rng.standard_normal((b, d, h, w)).astype(np.float32)

    ct = torch.from_numpy(cost)
    st = torch.from_numpy(samples)
    _, ind = ct.sort(1, True)
    pool = ind[:, :k]
    cg = torch.gather(ct, 1, pool)
    prob = F.softmax(cg, 1)
    sg = torch.gather(st, 1, pool)
    ref = (sg * prob).sum(dim=1).numpy()

    out = np.asarray(regression_topk(cost, samples, k))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
