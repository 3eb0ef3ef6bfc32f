"""Differentiable disparity warping (gather-based; no grid_sample on TPU).

Re-designs the reference's ``SpatialTransformer_grid``
(/root/reference/models/submodule.py:265-288): warp the *right* feature map to
a set of per-pixel disparity samples with bilinear interpolation,
``align_corners=True`` + zeros padding semantics, and the LRSC integer label
warp (/root/reference/models/loss.py:126-133).

With align_corners=True the normalized grid maps back to exact pixel
coordinates, so the op reduces to a 1-D horizontal gather + lerp along W —
a static-shape ``take_along_axis`` that XLA lowers to an efficient gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def disparity_warp(right: jax.Array, disp_samples: jax.Array) -> jax.Array:
    """Warp right features to D disparity hypotheses.

    right: [B, H, W, C]; disp_samples: [B, D, H, W] (disparities in pixels at
    this resolution; sample column is x - d).
    Returns warped right features [B, D, H, W, C]; out-of-range taps are 0
    (grid_sample padding_mode='zeros').
    """
    b, h, w, c = right.shape
    xs = jnp.arange(w, dtype=disp_samples.dtype)[None, None, None, :] - disp_samples
    x0 = jnp.floor(xs)
    frac = (xs - x0)[..., None]  # [B, D, H, W, 1]
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1

    def tap(xi):
        valid = (xi >= 0) & (xi < w)
        idx = jnp.clip(xi, 0, w - 1)
        # gather along W: right [B,1,H,W,C], idx [B,D,H,W,1]
        v = jnp.take_along_axis(right[:, None], idx[..., None], axis=3)
        return jnp.where(valid[..., None], v, 0.0)

    return (1.0 - frac) * tap(x0i) + frac * tap(x1i)


def warp_with_left(left: jax.Array, right: jax.Array, disp_samples: jax.Array):
    """Reference SpatialTransformer_grid return pair: (warped right, tiled left),
    both [B, D, H, W, C]."""
    warped = disparity_warp(right, disp_samples)
    d = disp_samples.shape[1]
    left_tiled = jnp.broadcast_to(left[:, None], (left.shape[0], d, *left.shape[1:]))
    return warped, left_tiled


def lrsc_label_warp(label: jax.Array, disp: jax.Array) -> jax.Array:
    """Integer-gather warp of the left GT label map to the right view.

    label: [B, H, W] (class ids); disp: [B, H, W] full-res disparity estimate.
    Sample column = clamp(x - d, 0, W-1) truncated to int — exactly
    /root/reference/models/loss.py:129-133.
    """
    b, h, w = label.shape
    xs = jnp.arange(w, dtype=disp.dtype)[None, None, :] - disp
    xi = jnp.clip(xs, 0.0, float(w - 1)).astype(jnp.int32)
    return jnp.take_along_axis(label, xi, axis=2)
