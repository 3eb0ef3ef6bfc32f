"""3x3x3 convolution, stride 1 and 2 — Pallas TPU "W-in-lanes" kernels.

Why: XLA's NDHWC conv emitter keeps C in the lane dimension, so the narrow-
channel 3-D convs that dominate the SemStereo volume pipeline (hourglass
entry convs Cin=32 s2, the concat stem 64->32, the classifier 32->32 —
/root/reference/models/SemStereo.py:110-118,221-223,166-177 via
nn/hourglass.py and models/semstereo.py) run at 4-12% of MXU peak
(lanes 32/128 filled, measured benchmarks/exp_conv3d4.py), and every conv
is bracketed by T(8,128) relayout copies.  A first im2col kernel (removed;
see benchmarks/README.md) packed taps into *lanes*; its lane-offset writes
made Mosaic both slow to compile (17 min) and slow to run (worse than XLA).

This design keeps every vector op tile-aligned:

  * operand layout [B, D+2, H+2, C, Wp] — the conv's *output width* lives in
    lanes (256 at the hot shapes -> full), C lives in sublanes;
  * the patch matrix P is assembled in VMEM as [T*C, W] — every tap is a
    sublane-block write at a multiple of C (>= 32, so 8-aligned) of a
    lane-offset (0/1/2) read — no strided or lane-offset *writes*;
  * the MXU matmul is W_super [128, T*C] x P [T*C, W]: output rows pack
    RH = 128//F consecutive output H-rows of all F channels, so the 128x128
    output tile is FULL even for F=32 convs.  W_super spreads each output
    row's 27C true taps over the T = 3*(window)*3*C patch rows (zeros
    elsewhere), trading RH x more per-matmul FLOPs for RH x lane fill —
    net win whenever F < 128;
  * the kernel loops over D inside one grid step, so the [D+2, RH+2, C, Wp]
    slab is DMA'd once per H-block and re-used by all 3 kd taps of all D
    output planes (DMA ~= 1.5x input bytes instead of XLA's relayout
    copies + implicit re-reads).

Contract (s1): y = lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3, NDHWC)
Contract (s2): y = lax.conv_general_dilated(x, w, (2,2,2), [(1,1)]*3, NDHWC)
optionally fused with a per-F affine (BN inference) and ReLU.

Backward: dx of the s1 conv is itself a 3x3x3 s1 conv (flipped kernel,
channel axes swapped) and re-uses this kernel; dw is 27 [C, M] x [M, F]
contractions (dense MXU shapes).  s2 dx routes through the phase-decomposed
transposed conv of ops.convops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roundup(a: int, m: int) -> int:
    return -(-a // m) * m


# --------------------------------------------------------------------------
# super-kernel construction (plain XLA, tiny)
# --------------------------------------------------------------------------


def _wsup(w3, rh: int, stride: int):
    """Per-kw super-kernels: 3 arrays [RH*F, 3*win*C], row (h', f), col
    (kd, r, c) with r the input-row index within the window — value
    w3[kd, r - stride*h', kw, c, f] where in range (output row oh0+h' reads
    window rows stride*h' + kh)."""
    _, _, _, c, f = w3.shape
    win = rh + 2 if stride == 1 else 2 * rh + 1
    outs = []
    for kw in range(3):
        out = jnp.zeros((rh, f, 3, win, c), w3.dtype)
        for hp in range(rh):
            out = out.at[hp, :, :, stride * hp : stride * hp + 3].set(
                jnp.transpose(w3[:, :, kw], (3, 0, 1, 2))
            )
        outs.append(out.reshape(rh * f, 3 * win * c))
    return outs


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _double_buffered(x_hbm, slab2, sem2, dt_in, win, stride_h, body_fn):
    """Run body_fn(slab) per (d_i, oh_i) grid step with the NEXT step's slab
    DMA in flight while the current step computes.  Grid is (B, ND, NH) with
    the H index fastest; the step's slab covers input planes
    [d_i*dt_in, +dt_in+2) and rows [oh_i*stride_h, +win).  slab2 has a
    leading 2-slot axis (double buffer); sem2 is a DMA semaphore pair."""
    b_i = pl.program_id(0)
    d_i = pl.program_id(1)
    oh_i = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    step = d_i * nh + oh_i
    slot = jax.lax.rem(step, 2)

    def copy_for(i_slot, d0, h0):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, pl.ds(d0, dt_in + 2), pl.ds(h0, win)],
            slab2.at[i_slot],
            sem2.at[i_slot],
        )

    @pl.when(step == 0)
    def _():
        copy_for(slot, dt_in * d_i, stride_h * oh_i).start()

    @pl.when(step + 1 < nd * nh)
    def _():
        nxt_oh = jnp.where(oh_i + 1 < nh, oh_i + 1, 0)
        nxt_d = jnp.where(oh_i + 1 < nh, d_i, d_i + 1)
        copy_for(1 - slot, dt_in * nxt_d, stride_h * nxt_oh).start()

    copy_for(slot, 0, 0).wait()
    body_fn(slab2, slot)


def _kernel_s1(x_hbm, w0_ref, w1_ref, w2_ref, sc_ref, out_ref,
               slab2, sem2, *, dt, rh, c, f, w, wp, relu):
    win = rh + 2
    wrefs = (w0_ref, w1_ref, w2_ref)

    def compute(slab2_, slot):
        def body(od, _):
            acc = None
            for kw in range(3):
                # contraction over (kd, khp, c): merge the three major dims
                lhs = slab2_[slot, pl.ds(od, 3), :, :, kw : kw + w]
                part = jax.lax.dot_general(
                    wrefs[kw][:], lhs.reshape(3 * win * c, w),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [RH*F, W]
                acc = part if acc is None else acc + part
            acc = acc * sc_ref[:, 0:1] + sc_ref[:, 1:2]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[0, od] = acc.reshape(rh, f, w).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, dt, body, 0, unroll=False)

    _double_buffered(x_hbm, slab2, sem2, dt, win, rh, compute)


def _kernel_s2(x_hbm, w0_ref, w1_ref, w2_ref, sc_ref, out_ref,
               slab2, sem2, *, dt, rh, c, f, ow, relu):
    win = 2 * rh + 1
    wrefs = (w0_ref, w1_ref, w2_ref)

    def compute(slab2_, slot):
        # slab: [2, 2*dt+2, win, 3, C, OW] — dim3 indexes the three
        # pre-built kw source planes (see _fwd_s2)
        def body(od, _):
            acc = None
            for kw in range(3):
                lhs = slab2_[slot, pl.ds(2 * od, 3), :, kw]  # [3, win, C, OW]
                part = jax.lax.dot_general(
                    wrefs[kw][:], lhs.reshape(3 * win * c, ow),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            acc = acc * sc_ref[:, 0:1] + sc_ref[:, 1:2]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[0, od] = acc.reshape(rh, f, ow).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, dt, body, 0, unroll=False)

    _double_buffered(x_hbm, slab2, sem2, 2 * dt, win, 2 * rh, compute)


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------


def _pick_rh(f: int) -> int:
    return max(128 // f, 1)


def _pick_dt(d: int, win: int, c: int, wlanes: int, t: int, w: int,
             s: int = 1) -> int | None:
    """Largest divisor tile of output-D fitting the VMEM budget: slab +
    patches + wsup + double-buffered [dt,128,W] out block + acc temps."""
    fixed = t * w * 2 + 128 * t * 2 + 128 * w * 4 * 2
    for dt in range(d, 0, -1):
        if d % dt:
            continue
        slab = 2 * (s * dt + 2) * win * c * wlanes * 2  # double-buffered
        outb = 2 * dt * 128 * w * 2
        if slab + outb + fixed < 9 * 1024 * 1024:
            return dt
    return None


def supported(x_shape, k_shape, stride: int) -> bool:
    b, d, h, w, c = x_shape
    if tuple(k_shape[:3]) != (3, 3, 3):
        return False
    f = k_shape[-1]
    if c % 8 or f < 8 or f > 128 or 128 % f:
        return False
    rh = _pick_rh(f)
    if stride == 1:
        if w % 128 or w < 128 or h % rh:
            return False
        wp = _roundup(w + 2, 128)
        t = 3 * (rh + 2) * 3 * c
        return _pick_dt(d, rh + 2, c, wp, t, w) is not None
    if stride == 2:
        if d % 2 or h % 2 or w % 2:
            return False
        ow = w // 2
        if ow % 128 or (h // 2) % rh:
            return False
        t = 3 * (2 * rh + 1) * 3 * c
        return _pick_dt(d // 2, (2 * rh + 1) * 3, c, ow, t, ow, s=2) is not None
    return False


def _scale_col(scale, bias, f, rh, dtype):
    """[RH*F, 2] f32: column 0 scale, column 1 bias, tiled over h'."""
    if scale is None:
        scale = jnp.ones((f,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((f,), jnp.float32)
    col = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)], -1)
    return jnp.tile(col, (rh, 1))


def _fwd_s1(x, w3, scale, bias, relu):
    b, d, h, w, c = x.shape
    f = w3.shape[-1]
    rh = _pick_rh(f)
    wp = _roundup(w + 2, 128)
    # C-major, padded: [B, D+2, H+2, C, Wp], zeros outside the image
    xcm = jnp.pad(
        jnp.transpose(x, (0, 1, 2, 4, 3)),
        ((0, 0), (1, 1), (1, 1), (0, 0), (1, wp - w - 1)),
    )
    w0, w1, w2 = _wsup(w3, rh, 1)
    sc = _scale_col(scale, bias, f, rh, x.dtype)
    t3 = 3 * (rh + 2) * c  # per-kw contraction depth
    dt = _pick_dt(d, rh + 2, c, wp, 3 * t3, w)

    out = pl.pallas_call(
        functools.partial(
            _kernel_s1, dt=dt, rh=rh, c=c, f=f, w=w, wp=wp, relu=relu
        ),
        grid=(b, d // dt, h // rh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(
            (1, dt, rh, f, w), lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, f, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, dt + 2, rh + 2, c, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * 128 * 3 * t3,
            bytes_accessed=(x.size * 3 + b * d * h * f * w) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xcm, w0, w1, w2, sc)
    return jnp.transpose(out, (0, 1, 2, 4, 3))


def _fwd_s2(x, w3, scale, bias, relu):
    b, d, h, w, c = x.shape
    f = w3.shape[-1]
    od, oh, ow = d // 2, h // 2, w // 2
    rh = _pick_rh(f)
    # three kw source planes: plane kw holds padded cols {2w' + kw}, i.e.
    # original cols {2w' + kw - 1} (zeros outside the image)
    xp = jnp.pad(
        jnp.transpose(x, (0, 1, 2, 4, 3)),
        ((0, 0), (1, 1), (1, 1), (0, 0), (1, 1)),
    )  # [B, D+2, H+2, C, W+2]
    planes = [
        lax.slice(
            xp, (0, 0, 0, 0, kw), (b, d + 2, h + 2, c, kw + 2 * ow - 1),
            (1, 1, 1, 1, 2),
        )
        for kw in range(3)
    ]
    xcm = jnp.stack(planes, axis=3)  # [B, D+2, H+2, 3, C, OW]
    w0, w1, w2 = _wsup(w3, rh, 2)
    sc = _scale_col(scale, bias, f, rh, x.dtype)
    t3 = 3 * (2 * rh + 1) * c
    dt = _pick_dt(od, (2 * rh + 1) * 3, c, ow, 3 * t3, ow, s=2)

    out = pl.pallas_call(
        functools.partial(
            _kernel_s2, dt=dt, rh=rh, c=c, f=f, ow=ow, relu=relu
        ),
        grid=(b, od // dt, oh // rh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(
            (1, dt, rh, f, ow), lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, od, oh, f, ow), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * dt + 2, 2 * rh + 1, 3, c, ow), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * od * oh * ow * 128 * 3 * t3,
            bytes_accessed=(x.size * 2 + b * od * oh * f * ow)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xcm, w0, w1, w2, sc)
    return jnp.transpose(out, (0, 1, 2, 4, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_wl(x, w3, stride=1, relu=False):
    """3x3x3 pad-1 conv, stride 1 or 2, NDHWC in/out, via the W-lanes kernel.
    x: [B,D,H,W,C]; w3: [3,3,3,C,F]."""
    fwd = _fwd_s1 if stride == 1 else _fwd_s2
    return fwd(x, w3, None, None, relu)


def conv3d_wl_affine(x, w3, scale, bias, stride=1, relu=False):
    """conv + per-F affine (+ReLU) fused: y = relu(conv(x) * scale + bias).
    Inference-path helper (BN folding); not differentiable."""
    fwd = _fwd_s1 if stride == 1 else _fwd_s2
    return fwd(x, w3, scale, bias, relu)


def _vjp_fwd(x, w3, stride, relu):
    y = conv3d_wl(x, w3, stride, relu)
    return y, (x, w3, y if relu else None)


def _vjp_bwd(stride, relu, res, gy):
    x, w3, y = res
    if relu:
        gy = jnp.where(y > 0, gy, 0).astype(gy.dtype)
    b, d, h, w, c = x.shape
    f = w3.shape[-1]
    if stride == 1:
        # dx = s1 conv of gy with spatially-flipped, channel-swapped kernel
        wflip = jnp.flip(w3, axis=(0, 1, 2)).swapaxes(3, 4)  # [3,3,3,F,C]
        if supported(gy.shape, wflip.shape, 1):
            dx = conv3d_wl(gy, wflip, 1, False)
        else:
            dx = lax.conv_general_dilated(
                gy, wflip, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        od, oh, ow = d, h, w
    else:
        from semstereo_tpu.ops.convops import conv_transpose_nd

        dx = conv_transpose_nd(gy, w3.swapaxes(3, 4), 2, 1, output_padding=1)
        od, oh, ow = d // 2, h // 2, w // 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    gflat = gy.reshape(-1, f)
    s = stride
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                sl = lax.slice(
                    xp,
                    (0, kd, kh, kw, 0),
                    (b, kd + s * (od - 1) + 1, kh + s * (oh - 1) + 1,
                     kw + s * (ow - 1) + 1, c),
                    (1, s, s, s, 1),
                )
                taps.append(
                    jnp.dot(sl.reshape(-1, c).T, gflat,
                            preferred_element_type=jnp.float32)
                )
    dw = jnp.stack(taps).reshape(3, 3, 3, c, f).astype(w3.dtype)
    return dx, dw


conv3d_wl.defvjp(_vjp_fwd, _vjp_bwd)
