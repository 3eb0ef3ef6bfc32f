"""Stride-2 3x3x3 convolution — Pallas TPU kernel (im2col-in-VMEM).

Why: XLA's conv lowering fills the MXU at roughly (Cin/128)*(Cout/128), so
the hourglass *entry* convs (Cin=32, stride 2 — /root/reference/models/
SemStereo.py:110-118 via nn/hourglass.py) run at 4-6% of peak (measured
2.43 ms for [1,24,256,256,32]->[1,12,128,128,64] on v5e; benchmarks/
exp_conv3d*.py).  Reformulations XLA can express (depth taps, phase packing,
space-to-depth folds) all lose to relayout traffic.  This kernel assembles
the im2col patch matrix [M, 27*Cin] in VMEM and feeds the MXU one dense
[M, 27*Cin] x [27*Cin, F] product per tile — K is lane-packed regardless of
Cin, so utilization is bounded by Cout/128 alone.

Contract: x [B, D, H, W, C] (NDHWC), kernel [3, 3, 3, C, F], stride 2,
padding 1 — exactly `lax.conv_general_dilated(x, k, (2,2,2), [(1,1)]*3)`.

Mosaic constraints shape the plumbing (all discovered the hard way):
  * HBM DMA slices must be whole, tile-aligned minor dims — and a C<128
    minor dim would be lane-padded to 128 (up to 4x traffic) — so P=128/C
    (2 for C=128) input columns are PACKED into one 128+-lane minor dim,
    and H rows are pre-split into even/odd pairs, all via a single pad +
    free reshape in XLA: xq [B, D+2, (H+2)/2, 2, WQ, P*C].  Every DMA then
    slices only untiled major dims.
  * No strided vector slices and no lane-dim reshapes in-kernel: every tap
    of the 3x3x3 stencil becomes a static unit-stride slice of the slab —
    rows via the (pair, phase) split, columns via (group, lane-block) —
    writing into a patch row block indexed by the output-column residue r
    (j = Q*m + r, Q = P/2).  The matmul result therefore leaves the kernel
    in (t, r, m) packed order; the caller unpacks with one cheap XLA
    transpose (identity when Q == 1).

Backward is the standard conv transpose / correlation pair expressed with
the XLA ops that ARE efficient at those shapes (dx: the phase-decomposed
deconv path of ops.convops with N = 8F lanes; dw: 27 [C, M] x [M, F]
contractions) — not a recomputation of this forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roundup(a: int, m: int) -> int:
    return -(-a // m) * m


def _geom(c: int):
    """(P columns packed per lane group, Q output-column residues)."""
    p = max(128 // c, 2)
    return p, p // 2


def _kernel(xq_hbm, w_ref, out_ref, slab, patches, sem,
            *, toh, ow, cin, cout, wq):
    b_i = pl.program_id(0)
    od_i = pl.program_id(1)
    ohb = pl.program_id(2)
    p, q = _geom(cin)
    owm = ow // q
    ll = p * cin

    # slab <- xq[b, 2od : 2od+3, toh*ohb : toh*ohb + toh+1, :, :, :]
    # (padded coords: row pair index t covers original rows 2t-1, 2t)
    copy = pltpu.make_async_copy(
        xq_hbm.at[b_i, pl.ds(2 * od_i, 3), pl.ds(toh * ohb, toh + 1)],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    # Tap (kd, kh, kw) feeds output (t, j= Q*m + r) from padded input row
    # 2t + kh (pair t + kh//2, phase kh % 2) and padded column 2j + kw
    # (group m + (2r+kw)//P, lane block (2r+kw) % P).
    for kd in range(3):
        for kh in range(3):
            rows = slab[kd, kh // 2 : kh // 2 + toh, kh % 2]  # [toh, wq, L]
            for kw in range(3):
                tcol = ((kd * 3 + kh) * 3 + kw) * cin
                for r in range(q):
                    g0, blk = divmod(2 * r + kw, p)
                    tap = rows[:, g0 : g0 + owm, blk * cin : (blk + 1) * cin]
                    patches[:, r, :, tcol : tcol + cin] = tap

    flat = patches[:].reshape(toh * q * owm, 27 * cin)
    acc = jnp.dot(flat, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(toh, q, owm, cout).astype(out_ref.dtype)


def _pick_toh(oh, ow, cin, cout, itemsize):
    """Output rows per tile: slab + patches + out under ~3 MiB of VMEM
    (leaves room for double buffering + Mosaic value temporaries)."""
    toh = min(oh, 16)
    while toh > 1 and (
        3 * (2 * toh + 2) * (2 * ow + 34) * cin * itemsize
        + toh * ow * 27 * cin * itemsize
        + toh * ow * cout * 4
    ) > 3 * 1024 * 1024:
        toh //= 2
    while oh % toh:
        toh //= 2
    return toh


def supported(x_shape, k_shape) -> bool:
    b, d, h, w, c = x_shape
    if tuple(k_shape[:3]) != (3, 3, 3) or c not in (32, 64, 128):
        return False
    if d % 2 or h % 2 or w % 2:
        return False
    _, q = _geom(c)
    return (w // 2) % q == 0


def _forward(x, kernel):
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    od, oh, ow = d // 2, h // 2, w // 2
    p, q = _geom(c)
    # +1 halo per spatial dim; W rounds so the packed group count is a
    # multiple of 8 (sublane tiling of the DMA'd minor dims).
    wq = _roundup(w + 2, 8 * p) // p
    hpad = _roundup(h + 2, 2)
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, hpad - h - 1), (1, wq * p - w - 1), (0, 0))
    )
    # free reshape: rows -> (pair, phase); columns -> (group, lane block)
    xq = xp.reshape(b, d + 2, hpad // 2, 2, wq, p * c)
    kmat = kernel.reshape(27 * c, f)
    toh = _pick_toh(oh, ow, c, f, x.dtype.itemsize)

    packed = pl.pallas_call(
        functools.partial(_kernel, toh=toh, ow=ow, cin=c, cout=f, wq=wq),
        grid=(b, od, oh // toh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, toh, q, ow // q, f),
            lambda bi, odi, ohb: (bi, odi, ohb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, od, oh, q, ow // q, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, toh + 1, 2, wq, p * c), x.dtype),
            pltpu.VMEM((toh, q, ow // q, 27 * c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * od * oh * ow * f * 27 * c,
            bytes_accessed=(x.size + kernel.size + b * od * oh * ow * f)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xq, kmat)
    if q == 1:
        return packed.reshape(b, od, oh, ow, f)
    # unpack (r, m) -> j = Q*m + r
    return packed.transpose(0, 1, 2, 4, 3, 5).reshape(b, od, oh, ow, f)


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
