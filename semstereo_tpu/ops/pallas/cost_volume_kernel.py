"""Fused cosine group-wise correlation cost volume — Pallas TPU kernel.

Replaces the 16-pass shift loop of the reference builder
(/root/reference/models/submodule.py:224-238): the XLA version re-reads both
normalized feature maps from HBM once per disparity shift; this kernel keeps
a (TH x W x C) tile of each view resident in VMEM, normalizes in-register,
and emits every disparity plane in one pass — HBM traffic drops from
O(D * H * W * C) to O(H * W * C) + output.

Implementation notes (see /opt/skills/guides/pallas_guide.md):
  * group reductions (sum over channels-per-group) are expressed as a
    [N, C] x [C, G] matmul with a block-diagonal selector so the lane
    dimension stays 128-aligned and the reduction rides the MXU;
  * shifts are static python-unrolled `pltpu.roll`s along W with an iota
    column mask — no dynamic shapes;
  * backward pass: custom_vjp whose cotangent rule reuses the XLA reference
    implementation's gradient (bitwise-equivalent math, negligible cost next
    to the 3-D hourglass backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semstereo_tpu.ops.cost_volume import gwc_volume_norm_xla


def _selectors(c: int, g: int, dtype):
    """Block-diagonal [C, G] selector (1/cpg scaled for the mean) and its
    [G, C] unscaled transpose for broadcasting group scales back to channels."""
    cpg = c // g
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cpg
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    sel = (rows == cols).astype(dtype)
    return sel / cpg, sel.T


def _kernel(l_ref, r_ref, out_ref, *, shifts, num_groups, eps):
    th, w, c = l_ref.shape[1:]
    g = num_groups
    mean_sel, expand_sel = _selectors(c, g, jnp.float32)
    sum_sel = mean_sel * (c // g)  # unscaled: plain per-group sum

    def normalize(x):
        x = x.astype(jnp.float32).reshape(th * w, c)
        sumsq = jnp.dot(x * x, sum_sel, preferred_element_type=jnp.float32)
        scale = 1.0 / (jnp.sqrt(sumsq) + eps)  # [N, G]
        return x * jnp.dot(scale, expand_sel, preferred_element_type=jnp.float32)

    ln = normalize(l_ref[0])
    rn = normalize(r_ref[0]).reshape(th, w, c)

    col = jax.lax.broadcasted_iota(jnp.int32, (th, w, g), 1)
    for d, s in enumerate(shifts):
        r_s = pltpu.roll(rn, s % w, 1) if s % w != 0 else rn
        corr = jnp.dot(
            ln * r_s.reshape(th * w, c), mean_sel,
            preferred_element_type=jnp.float32,
        ).reshape(th, w, g)
        valid = (col >= max(s, 0)) & (col < w + min(s, 0))
        out_ref[0, d] = jnp.where(valid, corr, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gwc_volume_norm_pallas(left, right, max_shift, num_groups, symmetric=True):
    """left, right: [B, H, W, C] -> [B, D, H, W, G] (see ops.cost_volume)."""
    return _forward(left, right, max_shift, num_groups, symmetric)


def _forward(left, right, max_shift, num_groups, symmetric):
    b, h, w, c = left.shape
    shifts = (
        tuple(range(-max_shift, max_shift)) if symmetric else tuple(range(max_shift))
    )
    d = len(shifts)

    # Tile H so (l, r, ln, rn, out) + pallas double-buffering fit in the
    # ~16 MB VMEM budget.
    th = h
    while th > 1 and (4 * th * w * c * 4 + th * w * d * num_groups * 4) > 3 * 1024 * 1024:
        th //= 2
    assert h % th == 0, (h, th)

    kernel = functools.partial(
        _kernel, shifts=shifts, num_groups=num_groups, eps=1e-5
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, d, th, w, num_groups), lambda bi, hi: (bi, 0, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, num_groups), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (d + 4),
            bytes_accessed=2 * b * h * w * c * 4 + b * d * h * w * num_groups * 4,
            transcendentals=2 * b * h * w * num_groups,
        ),
    )(left, right)


def _fwd(left, right, max_shift, num_groups, symmetric):
    out = _forward(left, right, max_shift, num_groups, symmetric)
    return out, (left, right)


def _bwd(max_shift, num_groups, symmetric, res, g):
    left, right = res
    _, vjp = jax.vjp(
        lambda l, r: gwc_volume_norm_xla(l, r, max_shift, num_groups, symmetric),
        left,
        right,
    )
    return vjp(g)


gwc_volume_norm_pallas.defvjp(_fwd, _bwd)
