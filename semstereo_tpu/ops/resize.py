"""Resize ops with PyTorch `F.interpolate` semantics (align_corners=False).

The reference uses bilinear/trilinear upsampling in several places
(segmenthead, SSR_upsample, Conv2x shape-fix, attention-volume interpolation:
/root/reference/models/submodule.py:49, :424, :152 and
/root/reference/models/SemStereo.py:279).  All live call sites upsample, where
``jax.image.resize(method='linear')`` (half-pixel centers, no antialias effect
when scaling up) matches torch ``align_corners=False`` exactly; parity is
asserted against torch in tests/test_resize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC images to (H', W')."""
    b, _, _, c = x.shape
    h2, w2 = out_hw
    return jax.image.resize(x, (b, h2, w2, c), method="linear")


def resize_trilinear(x: jax.Array, out_dhw: tuple[int, int, int]) -> jax.Array:
    """Trilinear resize of [B, D, H, W, C] volumes to (D', H', W')."""
    b = x.shape[0]
    c = x.shape[-1]
    d2, h2, w2 = out_dhw
    return jax.image.resize(x, (b, d2, h2, w2, c), method="linear")


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize of NHWC images."""
    b, _, _, c = x.shape
    h2, w2 = out_hw
    return jax.image.resize(x, (b, h2, w2, c), method="nearest")


def downsample_nearest_strided(x, factor: int):
    """Integer-factor nearest downsample by strided slicing (picks rows/cols
    0, f, 2f, ... like cv2.INTER_NEAREST for integer factors).

    Used to build the multi-scale disparity/label ground-truth pyramid
    (reference: datasets/us3d_.py:178-182).  Works on numpy or jnp arrays of
    shape [..., H, W].
    """
    return x[..., ::factor, ::factor]
