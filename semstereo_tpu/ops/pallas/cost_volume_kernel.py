"""Fused cosine group-wise correlation cost volume — Pallas TPU kernels.

Replaces the per-shift pass structure of the reference builder
(/root/reference/models/submodule.py:224-238): the XLA lowering re-reads the
normalized feature maps from HBM once per disparity plane; these kernels keep
a (TH x W x C) tile of each view resident in VMEM and emit every plane in one
pass, so HBM traffic is O(H*W*C + D*H*W*G) instead of O(D*H*W*C).

v2 design notes (v1 lost to the XLA path it was meant to beat — measured
0.51 ms vs 0.45 ms at the flagship shape — because it normalized both full
feature maps to fp32 in VMEM and `pltpu.roll`ed the whole tile per shift):

  * correlation is computed RAW then rescaled at group granularity:
    corr = (l . r_s) / ((|l|_g+eps)(|r_s|_g+eps)) — one [N,C]x[C,G] MXU
    contraction per shift against a block-diagonal group-sum selector, one
    [N,C] VPU product, and a [N,G] scale multiply; nothing C-wide is
    normalized or kept in fp32;
  * shifts are STATIC sublane-offset slices of a zero-padded copy of the
    right tile (built once per block) — no rolls;
  * products stay in the input dtype (bf16 on the flagship path, MXU-native)
    with fp32 accumulation via preferred_element_type (NO explicit
    precision= on the dots: precision=HIGHEST on bf16 operands makes Mosaic
    emit a tpu.matmul it rejects with "Bad lhs type" — repro'd minimal);
  * the backward pass is a mirrored Pallas kernel (same tiling, same one-pass
    structure) instead of re-running the XLA forward's vjp.

r5 status — OPTIONAL PATH, bandwidth push closed out: the kernel reaches
258 GB/s of the 819 GB/s HBM roofline (31.5%); the remaining headroom needs
bigger TH tiles, which needs a smaller out block per grid step, i.e.
chunking the D axis across grid steps — and that makes the shift offsets
dynamic (off = pad_lo - (shifts[0] + ci*dc + dl)), which Mosaic rejects
("cannot statically prove that index in dimension 0 is a multiple of 8",
repro'd r5; static sublane offsets of any value are fine, dynamic ones must
be 8-aligned, and the per-1 shifts span every residue by construction).
The static-shift structure IS the kernel's win over v1's rolls, so the two
constraints are in genuine tension.  Meanwhile the XLA builder keeps
winning every whole-model A/B (r4: -7% with the kernel on), so the default
stays XLA and this kernel remains the documented, tested, faster-in-
isolation alternative (`impl='pallas'`) with a native backward.

Kernel math (symmetric shifts s in [-max_shift, max_shift), positive
[0, max_shift)):  out[b,d,h,x,g] = mean_c ln[b,h,x,g,c] * rn[b,h,x-s_d,g,c]
for in-range x-s_d else 0, with ln = l / (|l|_g + eps) (reference
submodule.py:219 eps semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


EPS = 1e-5


def _shifts(max_shift: int, symmetric: bool) -> tuple[int, ...]:
    return (
        tuple(range(-max_shift, max_shift)) if symmetric else tuple(range(max_shift))
    )


def _group_selector(c: int, g: int, dtype):
    """Block-diagonal [C, G] 0/1 selector: column g sums channels of group g."""
    cpg = c // g
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cpg
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    return (rows == cols).astype(dtype)


def _inv_norm(x2d, sum_sel):
    """[N, C] -> fp32 [N, G] of 1 / (sqrt(sum_g x^2) + eps)."""
    sumsq = jax.lax.dot_general(
        (x2d * x2d), sum_sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return 1.0 / (jnp.sqrt(sumsq) + EPS)


def _pads(shifts):
    """(pad_lo, pad_hi) so that slice offset pad_lo - s stays in bounds for
    every shift: rpad row pad_lo + i holds r[i]."""
    return max(max(shifts), 0), max(-min(shifts), 0)


def _fwd_kernel(l_ref, r_ref, out_ref, rpad_ref, ipad_ref, *, shifts, num_groups):
    th, w, c = l_ref.shape[1:]
    g = num_groups
    n = th * w
    sum_sel = _group_selector(c, g, l_ref.dtype)
    mean_sel = sum_sel / (c // g)

    l2 = l_ref[0].reshape(n, c)
    r2 = r_ref[0].reshape(n, c)
    inv_l = _inv_norm(l2, sum_sel)  # [N, G] fp32

    # zero-padded right tile + inverse norms: row pad_lo + x of rpad holds
    # r[x] (flattened across the tile's rows; cross-row bleed is masked below).
    pad_lo, _ = _pads(shifts)
    rpad_ref[:] = jnp.zeros_like(rpad_ref)
    ipad_ref[:] = jnp.zeros_like(ipad_ref)
    rpad_ref[pl.ds(pad_lo, n)] = r2
    ipad_ref[pl.ds(pad_lo, n)] = _inv_norm(r2, sum_sel)

    col = jax.lax.broadcasted_iota(jnp.int32, (th, w, g), 1)
    for d, s in enumerate(shifts):
        # r_s[x] = r[x - s]  =>  rpad rows [pad_lo - s, pad_lo - s + n)
        off = pad_lo - s
        r_s = rpad_ref[pl.ds(off, n)]
        inv_r_s = ipad_ref[pl.ds(off, n)]
        raw = jax.lax.dot_general(
            l2 * r_s, mean_sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, G] fp32
        corr = (raw * inv_l * inv_r_s).reshape(th, w, g)
        valid = (col >= max(s, 0)) & (col < w + min(s, 0))
        out_ref[0, d] = jnp.where(valid, corr, 0.0).astype(out_ref.dtype)


def _pick_tile(
    h: int, w: int, c: int, d: int, g: int, itemsize: int,
    budget_kib: int = 3500,
) -> int:
    """Rows per block: inputs + padded scratch + output under the budget —
    double-buffered blocks plus Mosaic's stack of live value temporaries
    (l*r products, fp32 accumulators) must fit the 16 MB VMEM (measured:
    a 6 MB budget compiles to an 18 MB stack demand at the flagship shape)."""
    th = h
    while th > 1 and (
        3 * th * w * c * itemsize          # l, r, rpad
        + th * w * g * 8                   # inv norms fp32 (ipad + inv_l)
        + th * w * d * g * itemsize        # out block
    ) > budget_kib * 1024:
        th //= 2
    assert h % th == 0, (h, th)
    return th


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gwc_volume_norm_pallas(left, right, max_shift, num_groups, symmetric=True):
    """left, right: [B, H, W, C] -> [B, D, H, W, G] (see ops.cost_volume)."""
    return _forward(left, right, max_shift, num_groups, symmetric)


def _forward(left, right, max_shift, num_groups, symmetric):
    b, h, w, c = left.shape
    shifts = _shifts(max_shift, symmetric)
    d, g = len(shifts), num_groups
    pad = sum(_pads(shifts))
    th = _pick_tile(h, w, c, d, g, left.dtype.itemsize)

    kernel = functools.partial(_fwd_kernel, shifts=shifts, num_groups=g)
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
            (1, d, th, w, g), lambda bi, hi: (bi, 0, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, g), left.dtype),
        scratch_shapes=[
            pltpu.VMEM((th * w + pad, c), left.dtype),
            pltpu.VMEM((th * w + pad, g), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (d + 4),
            bytes_accessed=(2 * b * h * w * c + b * d * h * w * g)
            * left.dtype.itemsize,
            transcendentals=2 * b * h * w * g,
        ),
    )(left, right)


# ----------------------------------------------------------------------------
# Backward: one mirrored kernel computing both input cotangents.
#
# With u = l / (nl + eps), v_s = r_s / (nr_s + eps), out_d = (u . v_s)/cpg:
#   d/dl  = J_l^T [ sum_d gbar_d/cpg * v_{s_d} ]           (masked)
#   d/dr  = J_r^T [ sum_d shift_{-s_d}(gbar_d/cpg * u) ]   (masked)
# where J^T y = y/(n+eps) - x (x.y) / (n (n+eps)^2) is the vjp of
# x -> x/(|x|+eps) per group.
# ----------------------------------------------------------------------------


def _norm_vjp(x2d, y2d, sum_sel, expand_sel):
    """fp32 vjp of x -> x/(|x|_g + eps) applied to cotangent y (both [N, C])."""
    sumsq = jax.lax.dot_general(
        x2d * x2d, sum_sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    n_ = jnp.sqrt(sumsq)
    inv = 1.0 / (n_ + EPS)  # [N, G]
    xy = jax.lax.dot_general(
        x2d * y2d, sum_sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    coef = xy * inv * inv / jnp.maximum(n_, 1e-30)  # [N, G]
    inv_c = jax.lax.dot_general(
        inv, expand_sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    coef_c = jax.lax.dot_general(
        coef, expand_sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y2d.astype(jnp.float32) * inv_c - x2d.astype(jnp.float32) * coef_c


def _bwd_kernel(
    l_ref, r_ref, g_ref, gl_ref, gr_ref, vpad_ref, upad_ref,
    *, shifts, num_groups,
):
    th, w, c = l_ref.shape[1:]
    g = num_groups
    n = th * w
    cpg = c // g
    pad_lo, _ = _pads(shifts)
    dtype = l_ref.dtype
    sum_sel = _group_selector(c, g, dtype)
    expand_sel = _group_selector(c, g, jnp.float32).T  # [G, C]

    l2 = l_ref[0].reshape(n, c)
    r2 = r_ref[0].reshape(n, c)
    inv_l = _inv_norm(l2, sum_sel)
    u = l2.astype(jnp.float32) * jax.lax.dot_general(
        inv_l, expand_sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # normalized left, fp32 [N, C]

    inv_r = _inv_norm(r2, sum_sel)
    v = r2.astype(jnp.float32) * jax.lax.dot_general(
        inv_r, expand_sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vpad_ref[:] = jnp.zeros_like(vpad_ref)
    vpad_ref[pl.ds(pad_lo, n)] = v

    col2 = jax.lax.broadcasted_iota(jnp.int32, (th, w, g), 1).reshape(n, g)
    yl = jnp.zeros((n, c), jnp.float32)   # cotangent w.r.t. u
    upad_ref[:] = jnp.zeros_like(upad_ref)  # cotangent w.r.t. v (padded rows)
    for d, s in enumerate(shifts):
        valid = (col2 >= max(s, 0)) & (col2 < w + min(s, 0))
        gd = jnp.where(valid, g_ref[0, d].reshape(n, g).astype(jnp.float32), 0.0)
        gd = gd / cpg
        gd_c = jax.lax.dot_general(
            gd, expand_sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, C]
        off = pad_lo - s
        yl = yl + gd_c * vpad_ref[pl.ds(off, n)]
        upad_ref[pl.ds(off, n)] = upad_ref[pl.ds(off, n)] + gd_c * u

    yr = upad_ref[pl.ds(pad_lo, n)]
    gl_ref[0] = _norm_vjp(l2, yl, sum_sel, expand_sel).reshape(th, w, c).astype(
        gl_ref.dtype
    )
    gr_ref[0] = _norm_vjp(r2, yr, sum_sel, expand_sel).reshape(th, w, c).astype(
        gr_ref.dtype
    )


def _fwd(left, right, max_shift, num_groups, symmetric):
    out = _forward(left, right, max_shift, num_groups, symmetric)
    return out, (left, right)


def _bwd(max_shift, num_groups, symmetric, res, gbar):
    left, right = res
    b, h, w, c = left.shape
    shifts = _shifts(max_shift, symmetric)
    d, g = len(shifts), num_groups
    pad = sum(_pads(shifts))
    # fp32 scratch dominates and the bwd body keeps more fp32 values live
    # (u, v, yl, upad) — measured 16.05 MB stack demand at the 3500 KiB
    # budget, so halve it.
    th = _pick_tile(h, w, c, d, g, 4, budget_kib=1750)

    kernel = functools.partial(_bwd_kernel, shifts=shifts, num_groups=g)
    gl, gr = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, th, w, g), lambda bi, hi: (bi, 0, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(left.shape, left.dtype),
            jax.ShapeDtypeStruct(right.shape, right.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((th * w + pad, c), jnp.float32),
            pltpu.VMEM((th * w + pad, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * w * c * (d + 8),
            bytes_accessed=(4 * b * h * w * c + b * d * h * w * g)
            * left.dtype.itemsize,
            transcendentals=4 * b * h * w * g,
        ),
    )(left, right, gbar)
    return gl, gr


gwc_volume_norm_pallas.defvjp(_fwd, _bwd)
