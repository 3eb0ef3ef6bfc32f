"""Propagation taps, resize parity, and torch-geometry conv/deconv."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
from semstereo_tpu.ops import (
    conv_nd,
    conv_transpose_nd,
    propagate5,
    propagate5_volume,
    resize_bilinear,
    resize_trilinear,
)


def torch_propagation(x):
    """Oracle: one-hot 3x3 conv over replication-padded input
    (/root/reference/models/submodule.py:290-307)."""
    filt = torch.zeros(5, 1, 3, 3)
    filt[0, 0, 0, 0] = 1
    filt[1, 0, 1, 1] = 1
    filt[2, 0, 2, 2] = 1
    filt[3, 0, 2, 0] = 1
    filt[4, 0, 0, 2] = 1
    xp = F.pad(torch.from_numpy(x).unsqueeze(1), (1, 1, 1, 1), mode="replicate")
    return F.conv2d(xp, filt).numpy()


def test_propagate5_matches_onehot_conv(rng):
    x = rng.standard_normal((2, 5, 7)).astype(np.float32)
    ref = torch_propagation(x)
    out = np.asarray(propagate5(x))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_propagate5_volume_matches_2d_per_plane(rng):
    vol = rng.standard_normal((1, 3, 4, 6)).astype(np.float32)
    out = np.asarray(propagate5_volume(vol))  # [B,5,D,H,W]
    for d in range(3):
        ref = torch_propagation(vol[:, d])
        np.testing.assert_allclose(out[:, :, d], ref, atol=1e-6)


def test_resize_bilinear_matches_torch_upsample(rng):
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        size=(10, 14),
        mode="bilinear",
        align_corners=False,
    ).numpy()
    out = np.transpose(np.asarray(resize_bilinear(x, (10, 14))), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_resize_trilinear_matches_torch(rng):
    x = rng.standard_normal((1, 4, 6, 8, 2)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
        size=(8, 12, 16),
        mode="trilinear",
        align_corners=False,
    ).numpy()
    out = np.transpose(np.asarray(resize_trilinear(x, (8, 12, 16))), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv_nd_matches_torch_conv2d(rng):
    x = rng.standard_normal((2, 3, 9, 10)).astype(np.float32)
    w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)  # [O,I,kh,kw]
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1).numpy()
    out = conv_nd(
        np.transpose(x, (0, 2, 3, 1)),
        np.transpose(w, (2, 3, 1, 0)),  # HWIO
        stride=2,
        padding=1,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_conv_transpose_matches_torch_k4s2p1(rng):
    x = rng.standard_normal((1, 4, 5, 6)).astype(np.float32)
    w = rng.standard_normal((4, 3, 4, 4)).astype(np.float32)  # [I,O,kh,kw]
    ref = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()
    out = conv_transpose_nd(
        np.transpose(x, (0, 2, 3, 1)),
        np.transpose(w, (2, 3, 0, 1)),  # HW, In, Out
        stride=2,
        padding=1,
        precision=jax.lax.Precision.HIGHEST,
    )
    assert out.shape == (1, 10, 12, 3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_conv_transpose3d_matches_torch_k3s2p1op1(rng):
    x = rng.standard_normal((1, 4, 3, 4, 5)).astype(np.float32)  # NCDHW
    w = rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32)  # [I,O,kd,kh,kw]
    ref = F.conv_transpose3d(
        torch.from_numpy(x),
        torch.from_numpy(w),
        stride=2,
        padding=1,
        output_padding=1,
    ).numpy()
    out = conv_transpose_nd(
        np.transpose(x, (0, 2, 3, 4, 1)),
        np.transpose(w, (2, 3, 4, 0, 1)),  # DHW, In, Out
        stride=2,
        padding=1,
        output_padding=1,
        precision=jax.lax.Precision.HIGHEST,
    )
    assert out.shape == (1, 6, 8, 10, 2)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref, rtol=1e-4, atol=1e-4
    )


def test_depthwise3x3_shiftmad_matches_grouped_conv(rng):
    """Default-on depthwise 3x3 dispatch (shift-multiply-add form) must equal
    the grouped conv_general_dilated for stride 1 and 2, values and grads."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from semstereo_tpu.ops.convops import conv_nd

    for s in (1, 2):
        x = jnp.asarray(rng.standard_normal((2, 10, 12, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 1, 16)) * 0.3, jnp.float32)
        want = lax.conv_general_dilated(
            x, k, (s, s), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=16,
        )
        got = conv_nd(x, k, s, 1, groups=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def loss_new(x, k):
        return jnp.sum(conv_nd(x, k, 1, 1, groups=x.shape[-1]) ** 2)

    def loss_ref(x, k):
        return jnp.sum(
            lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1],
            ) ** 2
        )

    g1 = jax.grad(loss_new, argnums=(0, 1))(x, k)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
