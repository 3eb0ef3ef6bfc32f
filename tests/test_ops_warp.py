"""Warp parity vs torch grid_sample (align_corners=True, zeros padding) —
the exact configuration of /root/reference/models/submodule.py:283."""

import numpy as np
import torch
import torch.nn.functional as F

from semstereo_tpu.ops import disparity_warp, lrsc_label_warp, warp_with_left


def torch_spatial_transformer(y, disp_samples):
    """Oracle: reference SpatialTransformer_grid warp of y to the samples."""
    y = torch.from_numpy(y)
    disp = torch.from_numpy(disp_samples)
    b, c, h, w = y.shape
    nd = disp.shape[1]
    mh, mw = torch.meshgrid(
        torch.arange(h, dtype=y.dtype), torch.arange(w, dtype=y.dtype), indexing="ij"
    )
    mh = mh.reshape(1, 1, h, w).expand(b, nd, h, w)
    mw = mw.reshape(1, 1, h, w).expand(b, nd, h, w)
    gx = (mw - disp) / ((w - 1.0) / 2.0) - 1.0
    gy = mh / ((h - 1.0) / 2.0) - 1.0
    grid = torch.stack([gx, gy], dim=4)
    out = F.grid_sample(
        y,
        grid.view(b, nd * h, w, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).view(b, c, nd, h, w)
    return out.numpy()


def test_disparity_warp_matches_grid_sample(rng):
    b, c, h, w, nd = 2, 4, 5, 16, 3
    y = rng.standard_normal((b, c, h, w)).astype(np.float32)
    disp = (rng.uniform(-6, 6, (b, nd, h, w))).astype(np.float32)

    ref = torch_spatial_transformer(y, disp)  # [B, C, D, H, W]

    out = disparity_warp(np.transpose(y, (0, 2, 3, 1)), disp)  # [B, D, H, W, C]
    out_t = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_t, ref, rtol=1e-5, atol=1e-5)


def test_integer_disparity_is_exact_shift(rng):
    b, c, h, w = 1, 2, 3, 8
    y = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = np.full((b, 1, h, w), 2.0, dtype=np.float32)
    out = np.asarray(disparity_warp(y, disp))[:, 0]
    np.testing.assert_allclose(out[:, :, 2:], y[:, :, :-2], atol=1e-6)
    assert np.all(out[:, :, :2] == 0)


def test_warp_with_left_tiles_left(rng):
    b, c, h, w, nd = 1, 3, 4, 6, 2
    left = rng.standard_normal((b, h, w, c)).astype(np.float32)
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = np.zeros((b, nd, h, w), np.float32)
    warped, tiled = warp_with_left(left, right, disp)
    assert warped.shape == (b, nd, h, w, c)
    np.testing.assert_allclose(np.asarray(tiled)[:, 0], left)
    np.testing.assert_allclose(np.asarray(tiled)[:, 1], left)
    np.testing.assert_allclose(np.asarray(warped)[:, 0], right, atol=1e-6)


def test_lrsc_label_warp_matches_reference_gather(rng):
    """Oracle re-derivation of /root/reference/models/loss.py:126-133."""
    b, h, w = 2, 4, 10
    label = rng.integers(0, 6, (b, h, w)).astype(np.float32)
    disp = rng.uniform(-3, 12, (b, h, w)).astype(np.float32)

    y = torch.from_numpy(label).unsqueeze(1)
    xc = torch.arange(w).view(1, 1, w).expand(b, h, w)
    xd = torch.clamp(xc - torch.from_numpy(disp), 0, w - 1)
    ref = torch.gather(y, 3, xd.unsqueeze(1).long()).squeeze(1).numpy()

    out = np.asarray(lrsc_label_warp(label, disp))
    np.testing.assert_array_equal(out, ref)


def test_onehot_impls_match_gather(rng):
    """MXU one-hot warp (full-W and banded) vs the take_along_axis path,
    including out-of-image samples."""
    b, c, h, w, nd = 2, 3, 4, 20, 5
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = rng.uniform(-8, 8, (b, nd, h, w)).astype(np.float32)
    ref = np.asarray(disparity_warp(right, disp, impl="gather"))
    full = np.asarray(disparity_warp(right, disp, impl="onehot"))
    banded = np.asarray(disparity_warp(right, disp, impl="onehot", max_offset=8))
    np.testing.assert_allclose(full, ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(banded, ref, rtol=1e-6, atol=1e-6)


def test_shifts_impl_matches_gather(rng):
    """Fused static-shift accumulation variant (no einsum) vs the gather
    oracle, symmetric and asymmetric bands."""
    b, c, h, w, nd = 2, 3, 4, 20, 5
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = rng.uniform(-8, 8, (b, nd, h, w)).astype(np.float32)
    ref = np.asarray(disparity_warp(right, disp, impl="gather"))
    got = np.asarray(disparity_warp(right, disp, impl="shifts", max_offset=8))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    disp_pos = rng.uniform(0, 8, (b, nd, h, w)).astype(np.float32)
    ref = np.asarray(disparity_warp(right, disp_pos, impl="gather"))
    got = np.asarray(
        disparity_warp(right, disp_pos, impl="shifts", max_offset=0, min_offset=-8)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_asymmetric_band_matches_gather(rng):
    """Positive-only (WHU) disparities use a [-d, 1] band half as wide as the
    symmetric one; must still match the gather oracle exactly."""
    b, c, h, w, nd = 2, 3, 4, 20, 5
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = rng.uniform(0, 8, (b, nd, h, w)).astype(np.float32)
    ref = np.asarray(disparity_warp(right, disp, impl="gather"))
    banded = np.asarray(
        disparity_warp(right, disp, impl="onehot", max_offset=0, min_offset=-8)
    )
    np.testing.assert_allclose(banded, ref, rtol=1e-6, atol=1e-6)


def test_bf16_warp_keeps_fp32_coordinates(rng):
    """bf16 features at large W: coordinates/weights must be computed fp32 —
    bf16 xs would round to whole pixels for x >= 128 and degrade the warp to
    nearest-neighbor (ADVICE r1)."""
    import jax.numpy as jnp

    b, c, h, w = 1, 2, 2, 256
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = np.full((b, 1, h, w), 0.5, dtype=np.float32)
    ref = np.asarray(disparity_warp(right, disp, impl="gather"))
    out = np.asarray(
        disparity_warp(
            jnp.asarray(right, jnp.bfloat16),
            jnp.asarray(disp, jnp.bfloat16),
            impl="onehot",
            max_offset=4,
        )
    ).astype(np.float32)
    # bf16 features: ~1e-2 feature precision, but the 0.5/0.5 blend must be
    # present everywhere (nearest-neighbor would give exact right-column hits).
    np.testing.assert_allclose(out[:, :, :, 8:], ref[:, :, :, 8:], atol=0.05)
    nn_err = np.abs(out[0, 0, :, 1:] - right[0, :, :-1]).max()
    assert nn_err > 0.05, "warp degraded to nearest-neighbor under bf16"


def test_take_along_last_onehot_matches_gather(rng):
    from semstereo_tpu.ops.regression import take_along_last_onehot

    x = rng.standard_normal((3, 5, 7, 12)).astype(np.float32)
    ind = rng.integers(0, 12, (3, 5, 7, 4))
    ref = np.take_along_axis(x, ind, axis=-1)
    out = np.asarray(take_along_last_onehot(x, ind.astype(np.int32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_warp_strength_matches_naive(rng):
    """Correlate-then-lerp strength == mean_c(left * warped_right), both
    symmetric and asymmetric bands, including out-of-image zeros."""
    from semstereo_tpu.ops.warp import warp_strength

    b, c, h, w, nd = 2, 6, 4, 20, 5
    left = rng.standard_normal((b, h, w, c)).astype(np.float32)
    right = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disp = rng.uniform(-8, 8, (b, nd, h, w)).astype(np.float32)

    warped = np.asarray(disparity_warp(right, disp, impl="gather"))
    want = (left[:, None] * warped).mean(axis=-1)
    got = np.asarray(warp_strength(left, right, disp, max_offset=8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    disp_pos = rng.uniform(0, 8, (b, nd, h, w)).astype(np.float32)
    warped = np.asarray(disparity_warp(right, disp_pos, impl="gather"))
    want = (left[:, None] * warped).mean(axis=-1)
    got = np.asarray(
        warp_strength(left, right, disp_pos, max_offset=0, min_offset=-8)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
