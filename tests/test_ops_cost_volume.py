"""Cost-volume parity vs a NumPy/torch oracle re-deriving the reference math
(/root/reference/models/submodule.py:213-238 and submodule_.py:200-221)."""

import numpy as np
import pytest
import torch

from semstereo_tpu.ops import gwc_volume_norm


def oracle_volume(left, right, max_shift, num_groups, symmetric):
    """Torch oracle: per-shift cosine group correlation with boundary masking,
    NCHW in, [B, G, D, H, W] out."""
    l = torch.from_numpy(left)
    r = torch.from_numpy(right)
    b, c, h, w = l.shape
    cpg = c // num_groups

    def corr(a, bb):
        a = a.reshape(b, num_groups, cpg, h, -1)
        bb = bb.reshape(b, num_groups, cpg, h, -1)
        a = a / (a.norm(2, 2, keepdim=True) + 1e-5)
        bb = bb / (bb.norm(2, 2, keepdim=True) + 1e-5)
        return (a * bb).mean(dim=2)

    shifts = range(-max_shift, max_shift) if symmetric else range(max_shift)
    d = 2 * max_shift if symmetric else max_shift
    vol = torch.zeros(b, num_groups, d, h, w)
    for plane, s in enumerate(shifts):
        if s < 0:
            vol[:, :, plane, :, :s] = corr(l[:, :, :, :s], r[:, :, :, -s:])
        elif s > 0:
            vol[:, :, plane, :, s:] = corr(l[:, :, :, s:], r[:, :, :, :-s])
        else:
            vol[:, :, plane] = corr(l, r)
    return vol.numpy()


@pytest.mark.parametrize("symmetric", [True, False])
def test_gwc_volume_norm_matches_oracle(rng, symmetric):
    b, c, h, w = 2, 16, 6, 12
    max_shift, groups = 3, 4
    left = rng.standard_normal((b, c, h, w)).astype(np.float32)
    right = rng.standard_normal((b, c, h, w)).astype(np.float32)

    ref = oracle_volume(left, right, max_shift, groups, symmetric)  # [B,G,D,H,W]

    out = gwc_volume_norm(
        np.transpose(left, (0, 2, 3, 1)),
        np.transpose(right, (0, 2, 3, 1)),
        max_shift,
        groups,
        symmetric=symmetric,
    )  # [B, D, H, W, G]
    out_nchw = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-5, atol=1e-5)


def test_volume_masking_zero_outside(rng):
    b, c, h, w = 1, 8, 4, 8
    left = rng.standard_normal((b, h, w, c)).astype(np.float32)
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    vol = np.asarray(gwc_volume_norm(left, right, 2, 2, symmetric=True))
    # plane 0 = shift -2: columns W-2..W must be zero
    assert np.all(vol[:, 0, :, -2:, :] == 0)
    # plane 3 = shift +1: column 0 must be zero
    assert np.all(vol[:, 3, :, :1, :] == 0)
    # center plane (shift 0) is the cosine similarity in [-1, 1], nonzero a.s.
    assert np.abs(vol[:, 2]).max() <= 1 + 1e-5
    assert np.abs(vol[:, 2]).min() > 0
