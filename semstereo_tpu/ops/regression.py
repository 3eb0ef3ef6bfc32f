"""Disparity regression / variance / top-k sampling ops.

Re-designs /root/reference/models/submodule.py:164-170 (soft-argmin),
:257-263 (variance), :434-442 (top-k regression) and the in-model top-k plane
selection at /root/reference/models/SemStereo.py:298-310 — all as static-shape
``lax.top_k`` / ``take_along_axis`` ops that XLA tiles well on TPU.

Plane axis convention: volumes are [B, D, H, W]; plane d maps to disparity
value ``d - max_shift`` (symmetric, US3D) or ``d`` (positive, WHU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_along_last_onehot(x: jax.Array, ind: jax.Array) -> jax.Array:
    """``take_along_axis(x, ind, axis=-1)`` as a one-hot contraction.

    TPU gathers stream at a fraction of HBM bandwidth (profiled ~18 GB/s on
    this model); for a small gathered axis (D <= ~64 disparity planes) the
    same selection as a one-hot einsum runs on the MXU/VPU at full rate.
    x: [..., D], ind: [..., K] int -> [..., K].
    """
    d = x.shape[-1]
    oh = (ind[..., None] == jnp.arange(d, dtype=ind.dtype)).astype(x.dtype)
    return jnp.einsum("...kd,...d->...k", oh, x)


def disparity_values(ndisp: int, symmetric: bool, dtype=jnp.float32) -> jax.Array:
    """Per-plane disparity values: arange(-D/2, D/2) or arange(0, D)."""
    if symmetric:
        assert ndisp % 2 == 0
        return jnp.arange(-(ndisp // 2), ndisp // 2, dtype=dtype)
    return jnp.arange(ndisp, dtype=dtype)


def disparity_regression(prob: jax.Array, symmetric: bool) -> jax.Array:
    """Soft-argmin: sum_d p[d] * disp(d).  prob: [B, D, H, W] -> [B, H, W]."""
    vals = disparity_values(prob.shape[1], symmetric, prob.dtype)
    return jnp.sum(prob * vals[None, :, None, None], axis=1)


def disparity_variance(prob: jax.Array, disparity: jax.Array, symmetric: bool) -> jax.Array:
    """Sum_d p[d] * (disp(d) - d_hat)^2.  prob: [B,D,H,W], disparity: [B,H,W]
    -> [B, H, W]."""
    vals = disparity_values(prob.shape[1], symmetric, prob.dtype)
    sq = jnp.square(vals[None, :, None, None] - disparity[:, None])
    return jnp.sum(prob * sq, axis=1)


def topk_planes(weights: jax.Array, k: int, symmetric: bool):
    """Select the k highest-probability disparity planes per pixel.

    weights: [B, D, H, W] raw (pre-softmax) attention weights.
    Mirrors /root/reference/models/SemStereo.py:298-310: softmax over D, sort
    descending, keep top-k indices re-sorted ascending.

    Returns (topk_prob, topk_raw, disparity_samples):
      topk_prob [B, k, H, W]  — softmax(D) probabilities at the kept planes
      topk_raw  [B, k, H, W]  — raw weights at the kept planes
      disparity_samples [B, k, H, W] — plane disparity values (float)
    """
    d = weights.shape[1]
    assert k <= d, (k, d)
    # top_k over the last axis -> move D last.  softmax is monotonic, so
    # top-k on raw weights picks the same planes; the kept probabilities are
    # recovered from the logsumexp instead of materializing the full-volume
    # softmax (saves one [B,D,H,W] round-trip + a second one-hot contraction).
    raw_l = jnp.moveaxis(weights, 1, -1)  # [B, H, W, D]
    _, ind = jax.lax.top_k(raw_l, k)  # descending by weight
    ind = jnp.sort(ind, axis=-1)  # ascending plane order
    topk_raw = take_along_last_onehot(raw_l, ind)
    lse = jax.scipy.special.logsumexp(raw_l, axis=-1, keepdims=True)
    topk_prob = jnp.exp(topk_raw - lse)
    offset = d // 2 if symmetric else 0
    samples = ind.astype(weights.dtype) - offset
    to_bdhw = lambda x: jnp.moveaxis(x, -1, 1)
    return to_bdhw(topk_prob), to_bdhw(topk_raw), to_bdhw(samples)


def regression_topk(cost: jax.Array, disparity_samples: jax.Array, k: int) -> jax.Array:
    """Top-k soft-argmin over sampled planes
    (/root/reference/models/submodule.py:434-442).

    cost, disparity_samples: [B, D, H, W] -> pred [B, H, W].
    """
    cost_l = jnp.moveaxis(cost, 1, -1)
    samp_l = jnp.moveaxis(disparity_samples, 1, -1)
    topv, ind = jax.lax.top_k(cost_l, k)
    prob = jax.nn.softmax(topv, axis=-1)
    samp = take_along_last_onehot(samp_l, ind)
    return jnp.sum(prob * samp, axis=-1)
