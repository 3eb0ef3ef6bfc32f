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


def disparity_warp(
    right: jax.Array,
    disp_samples: jax.Array,
    impl: str = "onehot",
    max_offset: int | None = None,
    min_offset: int | None = None,
) -> jax.Array:
    """Warp right features to D disparity hypotheses.

    right: [B, H, W, C]; disp_samples: [B, D, H, W] (disparities in pixels at
    this resolution; sample column is x - d).
    Returns warped right features [B, D, H, W, C]; out-of-range taps are 0
    (grid_sample padding_mode='zeros').

    impl='onehot' (default): the bilinear two-tap selection is expressed as a
    sparse selection matrix contracted on the MXU — TPU gathers stream at
    ~18 GB/s while this runs at matmul rate.  When ``max_offset`` is given
    (floor-tap source-offset bound at this scale, e.g. maxdisp//4), the
    contraction runs over a band of statically shifted copies of ``right``
    covering source offsets [min_offset, max_offset + 1] instead of all W
    source columns — a "dynamic local filter" along W.  ``min_offset``
    defaults to ``-max_offset`` (symmetric ranges); positive-only disparity
    configs (WHU) pass ``min_offset=-d, max_offset=0`` so the band is d+2
    wide instead of 2d+2 (the positive-offset half can never match).
    Out-of-band / out-of-image taps match nothing or hit the zero padding,
    giving grid_sample's zeros padding for free.

    impl='shifts': same banded math as a sum of statically-shifted
    multiply-adds instead of a one-hot einsum.  Everything is elementwise +
    static slices, so XLA fuses the whole band into one loop fusion: the
    [B,H,W,O,C] shifted stack and the [B,D,H,W,O] weight tensor are never
    materialized, and no dot forces operand layouts (the einsum variant
    spends more time in relayout copies around the contraction than in the
    contraction itself — see benchmarks/results_r4.json profile).

    impl='gather': take_along_axis reference path (oracle for parity tests).

    Coordinates are always computed in float32 regardless of feature dtype:
    bf16 ulp is 1.0 for |x| >= 128, so bf16 xs/frac would collapse bilinear
    weights to nearest-neighbor over most of a >=512px-wide image (torch AMP
    likewise keeps grid_sample fp32).  Only the contraction weights are cast
    to the feature dtype at the end.
    """
    b, h, w, c = right.shape
    disp = disp_samples.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :] - disp
    x0 = jnp.floor(xs)
    frac = xs - x0  # [B, D, H, W] float32
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1

    if impl == "shifts":
        assert max_offset is not None, "impl='shifts' needs a band"
        hi = int(max_offset)
        lo = -hi if min_offset is None else int(min_offset)
        assert lo <= 0 <= hi + 1, (lo, hi)
        n_off = hi - lo + 2
        padded = jnp.pad(right, ((0, 0), (0, 0), (-lo, hi + 1), (0, 0)))
        cols = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
        o0 = x0i - cols - lo  # band index of the floor tap, [B, D, H, W]
        fr = frac.astype(right.dtype)
        one = jnp.ones((), right.dtype)
        out = jnp.zeros((b, disp.shape[1], h, w, c), right.dtype)
        for o in range(n_off):
            w_o = jnp.where(o0 == o, one - fr, 0.0) + jnp.where(
                o0 == o - 1, fr, 0.0
            )  # [B, D, H, W], fused away
            out = out + w_o[..., None] * padded[:, None, :, o : o + w]
        return out

    if impl == "onehot":
        if max_offset is None:
            # full source-column one-hot: [B,D,H,W,Wsrc] @ [B,H,Wsrc,C]
            cols = jnp.arange(w, dtype=jnp.int32)
            wmat = (1.0 - frac)[..., None] * (x0i[..., None] == cols) + frac[
                ..., None
            ] * (x1i[..., None] == cols)
            return jnp.einsum("bdhwv,bhvc->bdhwc", wmat.astype(right.dtype), right)

        # banded: source column = col + o with o in [lo, hi+1]
        hi = int(max_offset)
        lo = -hi if min_offset is None else int(min_offset)
        assert lo <= 0 <= hi + 1, (lo, hi)
        n_off = hi - lo + 2
        # shifted[b,h,w,o,c] = right[b,h,w+lo+o,c], zero outside the image
        padded = jnp.pad(right, ((0, 0), (0, 0), (-lo, hi + 1), (0, 0)))
        shifted = jnp.stack(
            [padded[:, :, o : o + w] for o in range(n_off)], axis=3
        )  # [B, H, W, O, C]
        cols = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
        o0 = x0i - cols - lo  # band index of the floor tap
        orange = jnp.arange(n_off, dtype=jnp.int32)
        # Cast frac to the feature dtype BEFORE building the [B,D,H,W,O]
        # band (the coords themselves stay fp32 above): the two tap masks
        # never overlap (o0 vs o0+1), so bf16(frac)*mask summed equals the
        # fp32 band cast afterwards bit-for-bit — at half the bytes for the
        # graph's largest intermediate.
        fr = frac.astype(right.dtype)
        wrel = (1.0 - fr)[..., None] * (o0[..., None] == orange).astype(
            right.dtype
        ) + fr[..., None] * ((o0 + 1)[..., None] == orange).astype(right.dtype)
        return jnp.einsum("bdhwo,bhwoc->bdhwc", wrel, shifted)

    def tap(xi):
        valid = (xi >= 0) & (xi < w)
        idx = jnp.clip(xi, 0, w - 1)
        # gather along W: right [B,1,H,W,C], idx [B,D,H,W,1]
        v = jnp.take_along_axis(right[:, None], idx[..., None], axis=3)
        return jnp.where(valid[..., None], v, 0.0)

    fr = frac.astype(right.dtype)[..., None]
    return (1.0 - fr) * tap(x0i) + fr * tap(x1i)


def warp_strength(
    left: jax.Array,
    right: jax.Array,
    disp_samples: jax.Array,
    max_offset: int,
    min_offset: int | None = None,
) -> jax.Array:
    """``mean_c(left * disparity_warp(right, disp))`` without materializing
    the warp: correlate FIRST (a G=1 cost volume over the static offset band
    — C is reduced once per offset), then bilinearly lerp the two bracketing
    correlation planes per pixel.

    Identical math to the reference's SpatialTransformer_grid + mean product
    (SemStereo.py:289-292): zero padding makes out-of-image taps contribute
    0 to the product, exactly like masking the correlation plane.  The fused
    warp+reduce recomputes the per-(d,h,w) tap weights for every channel
    (3.8 ms profiled at the flagship stage-1 shape); this form runs the C
    reduction at matmul rate and the lerp on C-free [B,D,H,W] planes.

    left: [B,H,W,C]; right: [B,H,W,C]; disp_samples: [B,D,H,W].
    Returns [B, D, H, W] fp32-accurate in the feature dtype.
    """
    b, h, w, c = right.shape
    hi = int(max_offset)
    lo = -hi if min_offset is None else int(min_offset)
    assert lo <= 0 <= hi + 1, (lo, hi)
    n_off = hi - lo + 2

    # correlation band: corr[b,o,h,w] = mean_c l[...,c] * r[b,h,w+lo+o,c],
    # zero outside the image
    padded = jnp.pad(right, ((0, 0), (0, 0), (-lo, hi + 1), (0, 0)))
    corr = jnp.stack(
        [
            jnp.mean(left * padded[:, :, o : o + w], axis=-1)
            for o in range(n_off)
        ],
        axis=1,
    )  # [B, O, H, W]

    disp = disp_samples.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :] - disp
    x0 = jnp.floor(xs)
    frac = xs - x0
    o0 = x0.astype(jnp.int32) - jnp.arange(w, dtype=jnp.int32) - lo
    fr = frac.astype(corr.dtype)

    out = jnp.zeros(disp_samples.shape, corr.dtype)
    for o in range(n_off):
        w_o = jnp.where(o0 == o, 1.0 - fr, 0.0) + jnp.where(o0 == o - 1, fr, 0.0)
        out = out + w_o * corr[:, o : o + 1]
    return out


def warp_with_left(
    left: jax.Array,
    right: jax.Array,
    disp_samples: jax.Array,
    impl: str = "onehot",
    max_offset: int | None = None,
    min_offset: int | None = None,
):
    """Reference SpatialTransformer_grid return pair: (warped right, tiled left),
    both [B, D, H, W, C]."""
    warped = disparity_warp(
        right, disp_samples, impl=impl, max_offset=max_offset, min_offset=min_offset
    )
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
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] - disp.astype(jnp.float32)
    xi = jnp.clip(xs, 0.0, float(w - 1)).astype(jnp.int32)
    return jnp.take_along_axis(label, xi, axis=2)
