"""Stride-2 3x3x3 convolution — Pallas TPU kernel (im2col-in-VMEM).

Why: XLA's conv lowering fills the MXU at roughly (Cin/128)*(Cout/128), so
the hourglass *entry* convs (Cin=32, stride 2 — /root/reference/models/
SemStereo.py:110-118 via nn/hourglass.py) run at 4-6% of peak (measured
2.43 ms for [1,24,256,256,32]->[1,12,128,128,64] on v5e; benchmarks/
exp_conv3d*.py).  Reformulations XLA can express (depth taps, phase packing,
space-to-depth folds) all lose to relayout traffic.  This kernel assembles
the im2col patch matrix [M, 27*Cin] in VMEM with static strided slices and
feeds the MXU one dense [M, 27*Cin] x [27*Cin, F] product per tile — K is
lane-packed regardless of Cin, so utilization is bounded by Cout/128 alone.

Contract: x [B, D, H, W, C] (NDHWC), kernel [3, 3, 3, C, F], stride 2,
padding 1 — exactly `lax.conv_general_dilated(x, k, (2,2,2), [(1,1)]*3)`.
The input is zero-padded once in HBM (+1 halo per spatial dim); every grid
cell then DMAs a fully-valid slab, so there is no edge branching in-kernel.

Backward is the standard conv transpose / correlation pair expressed with
the XLA ops that ARE efficient at those shapes (dx: the phase-decomposed
deconv path of ops.convops with N = 8F lanes; dw: a [27C, F] correlation
contraction over output positions) — not a recomputation of this forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, w_ref, out_ref, slab, patches, sem, *, toh, ow, cin, cout):
    b_i = pl.program_id(0)
    od_i = pl.program_id(1)
    ohb = pl.program_id(2)
    tih = 2 * toh + 2
    wpad = 2 * ow + 2

    # slab <- xp[b, 2*od : 2*od+3, 2*h0 : 2*h0+TIH, :, :]   (padded coords;
    # xp stays un-blocked in HBM, so every index incl. batch is explicit)
    copy = pltpu.make_async_copy(
        xp_hbm.at[b_i, pl.ds(2 * od_i, 3), pl.ds(2 * toh * ohb, tih)],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    # im2col: tap (kd, kh, kw) reads slab[kd, kh::2, kw::2, :] -> [TOH, OW, C]
    n = toh * ow
    for kd in range(3):
        plane = slab[kd]  # [TIH, WPAD, C]
        for kh in range(3):
            for kw in range(3):
                tap = lax.slice(
                    plane,
                    (kh, kw, 0),
                    (kh + 2 * (toh - 1) + 1, kw + 2 * (ow - 1) + 1, cin),
                    (2, 2, 1),
                )
                t = (kd * 3 + kh) * 3 + kw
                patches[:, t * cin : (t + 1) * cin] = tap.reshape(n, cin)

    acc = jnp.dot(patches[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(toh, ow, cout).astype(out_ref.dtype)
    del wpad


def _pick_toh(oh, ow, cin, cout, itemsize):
    """Output rows per tile: slab + patches + out under ~3 MiB of VMEM
    (leaves room for double buffering + Mosaic value temporaries)."""
    toh = min(oh, 16)
    while toh > 1 and (
        3 * (2 * toh + 2) * (2 * ow + 2) * cin * itemsize
        + toh * ow * 27 * cin * itemsize
        + toh * ow * cout * 4
    ) > 3 * 1024 * 1024:
        toh //= 2
    while oh % toh:
        toh //= 2
    return max(toh, 1)


def _forward(x, kernel):
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    od, oh, ow = d // 2, h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    kmat = kernel.reshape(27 * c, f)
    toh = _pick_toh(oh, ow, c, f, x.dtype.itemsize)
    tih = 2 * toh + 2

    return pl.pallas_call(
        functools.partial(_kernel, toh=toh, ow=ow, cin=c, cout=f),
        grid=(b, od, oh // toh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, toh, ow, f), lambda bi, odi, ohb: (bi, odi, ohb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, od, oh, ow, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tih, w + 2, c), x.dtype),
            pltpu.VMEM((toh * ow, 27 * c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * od * oh * ow * f * 27 * c,
            bytes_accessed=(x.size + kernel.size + b * od * oh * ow * f)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, kmat)


@jax.custom_vjp
def conv3d_s2_pallas(x, kernel):
    """lax.conv_general_dilated(x, kernel, (2,2,2), [(1,1)]*3, NDHWC) via the
    Pallas im2col kernel.  x: [B,D,H,W,C]; kernel: [3,3,3,C,F]."""
    return _forward(x, kernel)


def _fwd(x, kernel):
    return _forward(x, kernel), (x, kernel)


def _bwd(res, gy):
    x, kernel = res
    # dx[i, c] = sum_{o, k: 2o+k-1 = i} gy[o, f] w[k, c, f]  — exactly a
    # torch-geometry ConvTranspose(k3, s2, p1, op1) of gy with the kernel's
    # channel axes swapped (out_size = 2*OD = D for even dims).  Routed
    # through ops.convops' phase-decomposed x2 path (dense 8F-lane channels).
    from semstereo_tpu.ops.convops import conv_transpose_nd

    dx = conv_transpose_nd(gy, kernel.swapaxes(3, 4), 2, 1, output_padding=1)

    # dw[k, c, f] = sum_{b, o} x_pad[b, 2o + k, c] * gy[b, o, f]
    b, d, h, w, c = x.shape
    od, oh, ow = gy.shape[1:4]
    f = gy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    gflat = gy.reshape(-1, f)
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                sl = lax.slice(
                    xp,
                    (0, kd, kh, kw, 0),
                    (b, kd + 2 * (od - 1) + 1, kh + 2 * (oh - 1) + 1,
                     kw + 2 * (ow - 1) + 1, c),
                    (1, 2, 2, 2, 1),
                )
                taps.append(
                    jnp.dot(sl.reshape(-1, c).T, gflat,
                            preferred_element_type=jnp.float32)
                )
    dw = jnp.stack(taps).reshape(3, 3, 3, c, f).astype(kernel.dtype)
    return dx, dw


conv3d_s2_pallas.defvjp(_fwd, _bwd)
