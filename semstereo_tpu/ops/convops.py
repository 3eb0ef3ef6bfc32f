"""Low-level convolution helpers with exact PyTorch parity.

Provides channels-last N-D conv / transposed-conv wrappers around
``lax.conv_general_dilated``.  Transposed conv reproduces torch's
``ConvTranspose{2,3}d(kernel, stride, padding, output_padding)`` geometry
(used by FeatUp/spx deconvs k4 s2 p1 and the hourglass upsamplers k3 s2 p1
op1 — /root/reference/models/SemStereo.py:124-133, /root/reference/models/submodule.py:104)
by expressing it as an input-dilated convolution with the spatially-flipped
kernel: pad_lo = k-1-p, pad_hi = k-1-p+output_padding.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(ndim_spatial: int):
    if ndim_spatial == 2:
        return ("NHWC", "HWIO", "NHWC")
    if ndim_spatial == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(ndim_spatial)


def conv_nd(
    x: jax.Array,
    kernel: jax.Array,
    stride,
    padding,
    dilation=1,
    groups: int = 1,
    precision=None,
    fold_stack: bool | None = None,
) -> jax.Array:
    """Channels-last conv.  x: [B, *S, Cin], kernel: [*K, Cin//groups, Cout]."""
    nsp = x.ndim - 2
    stride = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    dilation = (dilation,) * nsp if isinstance(dilation, int) else tuple(dilation)
    if isinstance(padding, int):
        padding = [(padding, padding)] * nsp
    elif padding and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]
    if (
        nsp == 2
        and groups == x.shape[-1]
        and kernel.shape[-2] == 1
        and kernel.shape[-1] == groups
        and kernel.shape[:2] == (3, 3)
        and stride[0] == stride[1]
        and stride[0] in (1, 2)
        and dilation == (1, 1)
        and all(p == (1, 1) for p in padding)
        and os.environ.get("SEMSTEREO_NO_DW_SHIFTMAD") != "1"
    ):
        # Depthwise 3x3 as 9 shifted multiply-adds: XLA's grouped-conv path
        # brackets every backbone dw conv with T(8,128) relayout copies
        # (~350 MB/iter across the MobileViTv2 stages, benchmarks/
        # hlo_dump.py r5); the shift-mad form is pure elementwise VPU work
        # that fuses into one loop with no conv layout domain at all.
        # Whole-model A/B'd (results_r5.json); opt-out
        # SEMSTEREO_NO_DW_SHIFTMAD=1.
        return _depthwise3x3_shiftmad(x, kernel, stride[0])
    if (
        kernel.shape[: nsp] == (1,) * nsp
        and stride == (1,) * nsp
        and groups == 1
        and all(p == (0, 0) for p in padding)
    ):
        # Pointwise conv as a plain matmul: TPU's conv path re-tiles the
        # operands for a 1x1(x1) window (profiled 3.4 ms vs 0.21 ms at the
        # hourglass redir shape, bit-identical output).
        cin, cout = kernel.shape[-2:]
        y = jnp.dot(x.reshape(-1, cin), kernel.reshape(cin, cout), precision=precision)
        return y.reshape(*x.shape[:-1], cout)
    if (
        nsp == 3
        and stride in ((1, 1, 1), (2, 2, 2))
        and dilation == (1, 1, 1)
        and groups == 1
        and all(p == (1, 1) for p in padding)
        and jax.default_backend() == "tpu"
        and os.environ.get("SEMSTEREO_PALLAS_CONV3D") in ("1", "all", "s1", "stem")
    ):
        # OPT-IN (SEMSTEREO_PALLAS_CONV3D=s1|all).  The W-in-lanes kernel
        # wins its stride-1 microbenchmarks 2-3x (XLA's narrow-channel NDHWC
        # convs run at 8-33% of roofline with T(8,128) relayout copies; the
        # kernel keeps width in lanes and packs 128//Cout output rows per
        # tile) but the stride-2 variant LOSES 4x at the hourglass entry
        # shape (roofline, results_r4.json), and with BOTH enabled the whole
        # model drops 3.6% (13.12 -> 12.65 pairs/s) — custom-call layout
        # transitions plus the s2 loss eat the s1 wins.  's1' dispatches
        # only the winning stride-1 shapes.
        s = stride[0]
        mode = os.environ["SEMSTEREO_PALLAS_CONV3D"]
        from semstereo_tpu.ops.pallas import conv3d_wl as _wl

        if mode == "stem":
            # narrowest experiment: only the Cin=64 -> F=32 stride-1 stem
            # conv (the graph's single largest fusion, 7.4 ms profiled)
            ok = s == 1 and x.shape[-1] == 64 and kernel.shape[-1] == 32
        else:
            ok = s == 1 or mode in ("1", "all")
        if (
            kernel.shape[-1] < 128
            and ok
            and _wl.supported(x.shape, kernel.shape, s)
        ):
            return _wl.conv3d_wl(x, kernel, s, False)
    if (
        nsp == 3
        and stride == (1, 1, 1)
        and dilation == (1, 1, 1)
        and groups == 1
        and all(p == (1, 1) for p in padding)
        and kernel.shape[:3] == (3, 3, 3)
        and 1 < kernel.shape[-1] <= int(os.environ.get("SEMSTEREO_DTILE_MAXF", "32"))
        and x.shape[1] % 4 == 0
        and os.environ.get("SEMSTEREO_NO_CONV3D_DTILE") != "1"
    ):
        # D-tiled dense fold of narrow stride-1 volume convs (see
        # _conv3d_dtile).  Default-on for F <= 32: +1.2 pairs/s whole-model
        # (17.01 -> 18.46, benchmarks/results_r4.json) — 2x the MACs at full
        # 128-lane fill beats XLA's 6%-of-peak narrow-C direct conv.  F=64
        # convs (hourglass conv2, already 33% roofline direct) measured
        # better direct (18.31 with them folded) — SEMSTEREO_DTILE_MAXF
        # tunes the bound.  Opt-out: SEMSTEREO_NO_CONV3D_DTILE=1.
        # Deliberately NOT backend-gated: the CPU test suite must exercise
        # the exact dispatch the TPU runs (r4 lesson — TPU-gated kernels
        # shipped untested), and the fold is numerically equivalent on every
        # backend (fp-reassociation-level differences only).
        # SEMSTEREO_DTILE_DT tunes the tile: dt=8 does (8+2)/8 = 1.25x MACs
        # and 1.25x window-copy bytes vs dt=4's 1.5x/1.5x (A/B dimension).
        dt = int(os.environ.get("SEMSTEREO_DTILE_DT", "4"))
        if x.shape[1] % dt != 0:
            dt = 4
        return _conv3d_dtile(
            x, kernel, dt=dt, precision=precision, fold_stack=fold_stack
        )
    if (
        nsp == 3
        and stride == (1, 1, 1)
        and dilation == (1, 1, 1)
        and groups == 1
        and all(p == (1, 1) for p in padding)
        and kernel.shape[:3] == (3, 3, 3)
        and kernel.shape[-1] == 1
        and x.shape[1] <= 32
        and os.environ.get("SEMSTEREO_NO_CONV3D_DFOLD") != "1"
    ):
        # Cout=1 classifier head: fold D into channels -> one 2-D conv with
        # Cin=(D+2)*C (a block-banded kernel), Cout=D.  The direct conv runs
        # at 0.4% MXU (3.8 ms profiled at the stage-2 classif shape,
        # reference SemStereo.py:171-177); this form is sub-ms.  Default-on:
        # +0.43 pairs/s whole-model in the two-pass graph (15.41 -> 15.83,
        # results_r4.json).  It had lost 0.1 in the earlier fused-views
        # graph — dispatch decisions are graph-global, re-A/B after
        # structural changes.  Opt-out: SEMSTEREO_NO_CONV3D_DFOLD=1.
        # Not backend-gated, same rationale as the dtile branch above.
        return _conv3d_cout1_dfold(x, kernel, precision=precision)
    if (
        nsp == 3
        and stride == (2, 2, 2)
        and dilation == (1, 1, 1)
        and groups == 1
        and all(p == (1, 1) for p in padding)
        and kernel.shape[:3] == (3, 3, 3)
        and x.shape[1] % 4 == 0
        and os.environ.get("SEMSTEREO_CONV3D_S2FOLD", "0") != "0"
    ):
        # OPT-IN (SEMSTEREO_CONV3D_S2FOLD=<dt>|1): D-tiled dense fold of the
        # stride-2 hourglass entry convs (5.6% roofline direct,
        # results_r4.json) — same lane-fill trade as _conv3d_dtile but the
        # stride-2 window needs 2*dt+1 input planes per dt output planes
        # (~(2dt+1)/3 x MACs; dt=2 => 1.67x).
        env = os.environ["SEMSTEREO_CONV3D_S2FOLD"]
        dt = 2 if env == "1" else int(env)
        if (x.shape[1] // 2) % dt == 0:
            return _conv3d_dtile_s2(x, kernel, dt, precision=precision)
    if (
        nsp == 3
        and kernel.shape[0] == 3
        and stride[0] in (1, 2)
        and stride[1:] == stride[:1] * 2
        and dilation == (1, 1, 1)
        and groups == 1
        and padding[0] == (1, 1)
        and os.environ.get("SEMSTEREO_CONV3D_KDSPLIT") == "1"
    ):
        # EXPERIMENT (opt-in): decompose the 3x3x3 conv into 3 kd-plane 2-D
        # convs on a (B*D)-batched NHWC view — same FLOPs, but XLA's 2-D conv
        # path instead of the 5-D layouts whose relayout copies bracket every
        # volume conv in the profile.
        return _conv3d_kdsplit(x, kernel, stride[0], padding[1:], precision)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(nsp),
        feature_group_count=groups,
        precision=precision,
    )


def _depthwise3x3_shiftmad(x: jax.Array, kernel: jax.Array, s: int) -> jax.Array:
    """Depthwise 3x3 pad-1 conv (stride 1 or 2) as 9 shifted multiply-adds.

    x: [B, H, W, C]; kernel: [3, 3, 1, C] (torch depthwise layout:
    feature_group_count = C, one input channel per group).
    y[b,h,w,c] = sum_{kh,kw} x[b, s*h+kh-1, s*w+kw-1, c] * K[kh,kw,0,c].
    """
    b, h, w, c = x.shape
    oh, ow = (h + 2 - 3) // s + 1, (w + 2 - 3) // s + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for kh in range(3):
        for kw in range(3):
            sl = lax.slice(
                xp,
                (0, kh, kw, 0),
                (b, kh + s * (oh - 1) + 1, kw + s * (ow - 1) + 1, c),
                (1, s, s, 1),
            )
            term = sl * kernel[kh, kw, 0]
            out = term if out is None else out + term
    return out


def _conv3d_kdsplit(x, kernel, s, pad_hw, precision):
    """3xKhxKw stride-s pad-1(-D) conv as a sum over the 3 kd taps of 2-D
    convs: out[b,do] = sum_kd conv2d(x[b, s*do + kd - 1], K[kd])."""
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    od = (d + 2 - 3) // s + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for kd in range(3):
        # planes kd, kd+s, ..., kd+s*(od-1)
        sl = lax.slice(xp, (0, kd, 0, 0, 0), (b, kd + s * (od - 1) + 1, h, w, c),
                       (1, s, 1, 1, 1))
        y = lax.conv_general_dilated(
            sl.reshape(b * od, h, w, c),
            kernel[kd],
            window_strides=(s, s),
            padding=pad_hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        out = y if out is None else out + y
    oh, ow = out.shape[1:3]
    return out.reshape(b, od, oh, ow, f)


def _conv3d_dtile(
    x: jax.Array, kernel: jax.Array, dt: int = 4, precision=None,
    fold_stack: bool | None = None,
) -> jax.Array:
    """3x3x3 s1 p1 conv as a 2-D conv over D-tiles of ``dt`` output planes.

    Generalizes _conv3d_cout1_dfold: fold tiles of dt output planes (with a
    1-plane halo on each side) into channels — x2: [B*G, H, W, (dt+2)*C],
    k2: [3, 3, (dt+2)*C, dt*F] block-banded (nonzero iff 0 <= dp-do < 3).
    The dense matmul does (dt+2)/3 x the direct conv's MACs (2x at dt=4)
    but fills all 128 lanes on both operands, where XLA's direct narrow-C
    NDHWC conv measures 6% of MXU peak (profile, results_r4.json)."""
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    assert d % dt == 0, (d, dt)
    g = d // dt
    # Two window constructions, chosen per graph (measured, results_r5.json):
    #   stack+transpose — cheaper BACKWARD (transpose/unstack adjoint): the
    #     TRAIN default (b1 321 vs 369 ms with concat-of-slices);
    #   concat-of-slices — window planes land straight in the lane axis, no
    #     transpose, and the producer's elementwise epilogue fuses into the
    #     concat write: the EVAL default (the folded-stem mechanism).
    # Callers thread fold_stack=train (nn/layers.py); env overrides for A/B:
    # SEMSTEREO_DTILE_STACK=1 forces stack, =0 forces concat.
    env = os.environ.get("SEMSTEREO_DTILE_STACK", "")
    use_stack = bool(fold_stack) if env == "" else env == "1"
    if use_stack:
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        win = jnp.stack([xp[:, i * dt : i * dt + dt + 2] for i in range(g)], axis=1)
        x2 = jnp.transpose(win, (0, 1, 3, 4, 2, 5)).reshape(
            b * g, h, w, (dt + 2) * c
        )
    else:
        zeros = jnp.zeros((b, h, w, c), x.dtype)

        def plane(di):
            return zeros if di < 0 or di >= d else x[:, di]

        rows = [
            jnp.concatenate(
                [plane(i * dt + j - 1) for j in range(dt + 2)], axis=-1
            )
            for i in range(g)
        ]
        x2 = jnp.stack(rows, axis=1).reshape(b * g, h, w, (dt + 2) * c)
    k2 = jnp.zeros((3, 3, dt + 2, c, dt, f), kernel.dtype)
    for do in range(dt):
        k2 = k2.at[:, :, do : do + 3, :, do].set(
            kernel.transpose(1, 2, 0, 3, 4)
        )
    k2 = k2.reshape(3, 3, (dt + 2) * c, dt * f)
    y = lax.conv_general_dilated(
        x2, k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B*G, H, W, dt*F]
    y = y.reshape(b, g, h, w, dt, f)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, d, h, w, f)


def _conv3d_dtile_s2(
    x: jax.Array, kernel: jax.Array, dt: int = 2, precision=None
) -> jax.Array:
    """3x3x3 stride-2 pad-1 conv as a stride-2 2-D conv over D-tiles.

    Output plane do reads input planes 2*do-1..2*do+1; a tile of dt output
    planes therefore reads a window of 2*dt+1 input planes.  Fold windows
    into channels — x2: [B*G, H, W, (2dt+1)*C], k2 banded with
    k2[kh, kw, 2*do+kd, c, do, f] = K[kd, kh, kw, c, f] — and run ONE dense
    stride-2 2-D conv.  (2dt+1)/3 x the direct conv's MACs at full lane
    fill vs the 5.6%-of-roofline direct NDHWC s2 conv."""
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    od = d // 2
    assert od % dt == 0, (d, dt)
    g = od // dt
    win = 2 * dt + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    stack = jnp.stack(
        [xp[:, 2 * i * dt : 2 * i * dt + win] for i in range(g)], axis=1
    )  # [B, G, win, H, W, C]
    x2 = jnp.transpose(stack, (0, 1, 3, 4, 2, 5)).reshape(b * g, h, w, win * c)
    k2 = jnp.zeros((3, 3, win, c, dt, f), kernel.dtype)
    for do in range(dt):
        k2 = k2.at[:, :, 2 * do : 2 * do + 3, :, do].set(
            kernel.transpose(1, 2, 0, 3, 4)
        )
    k2 = k2.reshape(3, 3, win * c, dt * f)
    y = lax.conv_general_dilated(
        x2, k2, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B*G, H/2, W/2, dt*F]
    oh, ow = y.shape[1:3]
    y = y.reshape(b, g, oh, ow, dt, f)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, od, oh, ow, f)


def _conv3d_cout1_dfold(x: jax.Array, kernel: jax.Array, precision=None) -> jax.Array:
    """3x3x3 s1 p1 conv with Cout=1 as a 2-D conv over a D-folded layout.

    out[b,do,h,w] = sum_{kd,kh,kw,c} K[kd,kh,kw,c,0] x_pad[b,do+kd,h+kh,w+kw,c]
    = conv2d(x2, K2) with x2 = [B,H,W,(D+2)*C] and K2[(dp,c),do] banded
    (nonzero iff 0 <= dp-do < 3)."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    x2 = jnp.transpose(xp, (0, 2, 3, 1, 4)).reshape(b, h, w, (d + 2) * c)
    k2 = jnp.zeros((3, 3, d + 2, c, d), kernel.dtype)
    for do in range(d):
        k2 = k2.at[:, :, do : do + 3, :, do].set(kernel[:, :, :, :, 0].transpose(1, 2, 0, 3))
    k2 = k2.reshape(3, 3, (d + 2) * c, d)
    y = lax.conv_general_dilated(
        x2, k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B, H, W, D]
    return jnp.transpose(y, (0, 3, 1, 2))[..., None]


def classifier_head_fused(
    x: jax.Array,
    k0: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    k1: jax.Array,
    dt: int = 4,
    precision=None,
) -> jax.Array:
    """Classifier3D chain (BasicConv 3^3 s1 + BN + ReLU, then Cout=1 3^3
    conv — reference classif/classif_att_, SemStereo.py:171-177) executed
    END-TO-END in the D-tiled folded layout.

    The r4 default dispatch folds each conv separately (_conv3d_dtile then
    _conv3d_cout1_dfold), paying an unfold transpose + a refold transpose of
    the whole [B, D, H, W, F] volume between them — part of the 18.9 ms/iter
    of relayout copies the r4 profile names as the frontier.  Here the
    volume is folded ONCE; the BN affine (scale/bias, folded from eval
    running stats) and ReLU apply in the folded layout; conv1's halo planes
    come from cheap channel slices of adjacent groups; and only the final
    [B, D, H, W, 1] output (C=1: 1/F the bytes) leaves the folded domain.

    x: [B, D, H, W, C]; k0: [3,3,3,C,F]; scale/bias: [F]; k1: [3,3,3,F,1].
    """
    b, d, h, w, c = x.shape
    f = k0.shape[-1]
    assert d % dt == 0, (d, dt)
    g = d // dt
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    win = jnp.stack([xp[:, i * dt : i * dt + dt + 2] for i in range(g)], axis=1)
    x2 = jnp.transpose(win, (0, 1, 3, 4, 2, 5)).reshape(b * g, h, w, (dt + 2) * c)
    k0f = jnp.zeros((3, 3, dt + 2, c, dt, f), k0.dtype)
    for do in range(dt):
        k0f = k0f.at[:, :, do : do + 3, :, do].set(k0.transpose(1, 2, 0, 3, 4))
    k0f = k0f.reshape(3, 3, (dt + 2) * c, dt * f)
    y = lax.conv_general_dilated(
        x2, k0f, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B*G, H, W, dt*F]
    st = jnp.tile(scale.astype(y.dtype), dt)
    bt = jnp.tile(bias.astype(y.dtype), dt)
    y = jax.nn.relu(y * st + bt)

    # conv1 halo: group i additionally needs plane i*dt-1 (= last plane of
    # group i-1) and plane (i+1)*dt (= first plane of group i+1) — channel
    # slices of the neighbouring group rows, zero at the volume boundary
    # (conv pad).
    y5 = y.reshape(b, g, h, w, dt * f)
    zeros = jnp.zeros((b, 1, h, w, f), y.dtype)
    prev_last = jnp.concatenate(
        [zeros, y5[:, : g - 1, ..., (dt - 1) * f :]], axis=1
    )
    next_first = jnp.concatenate([y5[:, 1:, ..., :f], zeros], axis=1)
    y_ext = jnp.concatenate([prev_last, y5, next_first], axis=-1).reshape(
        b * g, h, w, (dt + 2) * f
    )
    k1f = jnp.zeros((3, 3, dt + 2, f, dt), k1.dtype)
    for do in range(dt):
        k1f = k1f.at[:, :, do : do + 3, :, do].set(k1[..., 0].transpose(1, 2, 0, 3))
    k1f = k1f.reshape(3, 3, (dt + 2) * f, dt)
    out = lax.conv_general_dilated(
        y_ext, k1f, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B*G, H, W, dt]
    out = out.reshape(b, g, h, w, dt)
    return jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(b, d, h, w)[..., None]


def folded_stem_conv(
    att: jax.Array,
    tl: jax.Array,
    wr: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    dt: int = 4,
    precision=None,
) -> jax.Array:
    """Stage-2 stem (volume build + BasicConv 3^3 s1 + BN affine + ReLU,
    models/semstereo.py) with the D-tiled conv input built DIRECTLY from the
    warp outputs.

    The default path materializes volume = att[..., None] * concat(tl, wr)
    ([B, D, H, W, 2C], ~200 MB bf16 at the flagship shape) and then window-
    stacks it into the dtile layout — the graph's single largest copy pair
    (330+302 MB, benchmarks/hlo_dump.py).  Here each window plane's channel
    block is computed straight from att/tl/wr slices, so the folded tensor
    is the elementwise producer's ONLY materialization (duplicated halo
    planes cost (dt+2)/dt extra VPU work, not extra round trips).

    att: [B, D, H, W]; tl, wr: [B, D, H, W, C]; kernel: [3,3,3,2C,F];
    scale/bias: [F] (folded eval BN).  Returns [B, D, H, W, F].
    """
    b, d, h, w = att.shape
    c = tl.shape[-1]
    assert d % dt == 0, (d, dt)
    g = d // dt
    zeros = jnp.zeros((b, h, w, 2 * c), tl.dtype)

    def block(di: int) -> jax.Array:
        if di < 0 or di >= d:
            return zeros
        a = att[:, di, :, :, None]
        return jnp.concatenate([a * tl[:, di], a * wr[:, di]], axis=-1)

    rows = [
        jnp.concatenate([block(i * dt + j - 1) for j in range(dt + 2)], axis=-1)
        for i in range(g)
    ]  # G x [B, H, W, (dt+2)*2C]
    x2 = jnp.stack(rows, axis=1).reshape(b * g, h, w, (dt + 2) * 2 * c)

    f = kernel.shape[-1]
    k2 = jnp.zeros((3, 3, dt + 2, 2 * c, dt, f), kernel.dtype)
    for do in range(dt):
        k2 = k2.at[:, :, do : do + 3, :, do].set(kernel.transpose(1, 2, 0, 3, 4))
    k2 = k2.reshape(3, 3, (dt + 2) * 2 * c, dt * f)
    y = lax.conv_general_dilated(
        x2, k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B*G, H, W, dt*F]
    st = jnp.tile(scale.astype(y.dtype), dt)
    bt = jnp.tile(bias.astype(y.dtype), dt)
    y = jax.nn.relu(y * st + bt)
    y = y.reshape(b, g, h, w, dt, f)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, d, h, w, f)


def _dfold_kernel_trunc(kernel: jax.Array, d: int) -> jax.Array:
    """Truncated-band D-fold of a [3,3,3,C,1] kernel: [3, 3, D*C, D] where
    output plane do reads input planes {do-1, do, do+1} ∩ [0, D) — the
    boundary taps are simply dropped instead of padding D with zero planes
    (the pad row would multiply zeros anyway)."""
    c = kernel.shape[3]
    k2 = jnp.zeros((3, 3, d, c, d), kernel.dtype)
    for do in range(d):
        for kd in range(3):
            dp = do - 1 + kd
            if 0 <= dp < d:
                k2 = k2.at[:, :, dp, :, do].set(kernel[kd, :, :, :, 0])
    return k2.reshape(3, 3, d * c, d)


def classifier_head_fused_v2(
    x: jax.Array,
    k0: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    k1: jax.Array,
    dt: int = 4,
    precision=None,
) -> jax.Array:
    """Conservative variant of classifier_head_fused: conv0 stays the
    D-tiled fold, conv1 stays the full-D fold (both exactly as the r4
    default dispatch computes them) — but the unfold transpose after conv0
    and the pad+refold transpose before conv1 are COMPOSED into one
    relayout [B,G,H,W,dt,F] -> [B,H,W,D*F], and conv1 uses the truncated
    band kernel so no D-pad copy is needed.  One full-volume
    materialization fewer than the per-conv dispatch; none of v1's halo
    channel-concats (which lost the A/B)."""
    b, d, h, w, c = x.shape
    f = k0.shape[-1]
    assert d % dt == 0, (d, dt)
    g = d // dt
    zeros = jnp.zeros((b, h, w, c), x.dtype)
    rows = [
        jnp.concatenate(
            [
                zeros if (di := i * dt + j - 1) < 0 or di >= d else x[:, di]
                for j in range(dt + 2)
            ],
            axis=-1,
        )
        for i in range(g)
    ]  # concat-of-slices fold (see _conv3d_dtile): no transpose, producer fuses
    x2 = jnp.stack(rows, axis=1).reshape(b * g, h, w, (dt + 2) * c)
    k0f = jnp.zeros((3, 3, dt + 2, c, dt, f), k0.dtype)
    for do in range(dt):
        k0f = k0f.at[:, :, do : do + 3, :, do].set(k0.transpose(1, 2, 0, 3, 4))
    k0f = k0f.reshape(3, 3, (dt + 2) * c, dt * f)
    y = lax.conv_general_dilated(
        x2, k0f, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    st = jnp.tile(scale.astype(y.dtype), dt)
    bt = jnp.tile(bias.astype(y.dtype), dt)
    y = jax.nn.relu(y * st + bt)
    # composed relayout: [B*G, H, W, dt*F] -> [B, H, W, (G*dt)*F] = D*F
    y6 = y.reshape(b, g, h, w, dt * f)
    x1 = jnp.transpose(y6, (0, 2, 3, 1, 4)).reshape(b, h, w, d * f)
    k1f = _dfold_kernel_trunc(k1, d)
    out = lax.conv_general_dilated(
        x1, k1f, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )  # [B, H, W, D]
    return jnp.transpose(out, (0, 3, 1, 2))[..., None]


def conv_transpose_nd(
    x: jax.Array,
    kernel: jax.Array,
    stride,
    padding,
    output_padding=0,
    precision=None,
    phase: bool | None = None,
) -> jax.Array:
    """Channels-last transposed conv with torch geometry.

    x: [B, *S, Cin], kernel: [*K, Cin, Cout] (stored un-flipped; flipped
    here).  out_size = (in-1)*stride - 2*padding + k + output_padding.

    Exact-x2 stride-2 cases (every deconv in this codebase: k3 p1 op1 and
    k4 p1 op0) route through the phase-decomposed path: an input-dilated conv
    wastes 1 - 1/s^d of its MACs multiplying inserted zeros and leaves MXU
    lanes idle at small C_out; decomposing by output parity gives ONE dense
    conv with s^d-packed output channels + a pixel shuffle — identical math,
    ~3.4x fewer MACs, full 128-lane utilisation.
    """
    nsp = x.ndim - 2
    stride = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    padding = (padding,) * nsp if isinstance(padding, int) else tuple(padding)
    output_padding = (
        (output_padding,) * nsp if isinstance(output_padding, int) else tuple(output_padding)
    )
    ks = kernel.shape[:nsp]
    # Phase-vs-dilated policy.  The phase decomposition saves ~3.4x MACs,
    # but its pixel-shuffle transposes are relayout copies (~100 MB class
    # each at the hourglass deconvs, benchmarks/hlo_dump.py) — measured
    # whole-model (results_r5.json): EVAL wins +4.7% on the dilated path
    # (20.0 vs 19.1 pairs/s), TRAIN wins 7% on the phase path (323 vs
    # 346 ms/step; the phase conv's backward structure fuses better).  The
    # model passes ``phase=train`` accordingly; ``phase=None`` (external
    # callers, tests) keeps the legacy phase default.  Env overrides for
    # A/B: SEMSTEREO_NO_PHASE_DECONV=1|all|2d|3d forces dilated,
    # SEMSTEREO_PHASE_DECONV=1 forces phase.
    nope = os.environ.get("SEMSTEREO_NO_PHASE_DECONV", "")
    use_phase = True if phase is None else bool(phase)
    if nope in ("1", "all") or nope == f"{nsp}d":
        use_phase = False
    elif os.environ.get("SEMSTEREO_PHASE_DECONV") == "1":
        use_phase = True
    if (
        all(s == 2 for s in stride)
        and all(
            k + op - 2 * p == 2 for k, p, op in zip(ks, padding, output_padding)
        )
        and use_phase
    ):
        return _conv_transpose_x2_phase(x, kernel, padding, precision)
    pads = [
        (k - 1 - p, k - 1 - p + op) for k, p, op in zip(ks, padding, output_padding)
    ]
    flipped = jnp.flip(kernel, axis=tuple(range(nsp)))
    return lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,) * nsp,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_dim_numbers(nsp),
        precision=precision,
    )


def _phase_taps_1d(k: int, p: int):
    """Per output-parity tap table for a stride-2 transposed conv dim.

    Returns ({r: [(flip_tap_index, input_offset)]}, off_min, off_max): output
    o = 2m + r reads input x[m + input_offset] weighted by flipW[t]."""
    lo = k - 1 - p
    taps = {0: [], 1: []}
    for r in (0, 1):
        for t in range(k):
            num = r + t - lo
            if num % 2 == 0:
                taps[r].append((t, num // 2))
    offs = [m for lst in taps.values() for _, m in lst]
    return taps, min(offs), max(offs)


def _conv_transpose_x2_phase(x, kernel, padding, precision):
    import itertools

    nsp = x.ndim - 2
    ks = kernel.shape[:nsp]
    cin, cout = kernel.shape[-2:]
    flip = jnp.flip(kernel, axis=tuple(range(nsp)))
    maps = [_phase_taps_1d(ks[d], padding[d]) for d in range(nsp)]
    ls = [m[2] - m[1] + 1 for m in maps]

    # Unified kernel [*L, Cin, 2^nsp * Cout], phase-major channel packing.
    nphase = 2**nsp
    u = jnp.zeros((*ls, cin, nphase * cout), kernel.dtype)
    for phases in itertools.product((0, 1), repeat=nsp):
        pidx = 0
        for r in phases:
            pidx = pidx * 2 + r
        for taps in itertools.product(*[maps[d][0][phases[d]] for d in range(nsp)]):
            l = tuple(taps[d][1] - maps[d][1] for d in range(nsp))
            w = flip[tuple(t for t, _ in taps)]  # [Cin, Cout]
            u = u.at[(*l, slice(None), slice(pidx * cout, (pidx + 1) * cout))].add(w)

    pads = [(-maps[d][1], maps[d][2]) for d in range(nsp)]
    y = lax.conv_general_dilated(
        x, u, (1,) * nsp, pads,
        dimension_numbers=_dim_numbers(nsp), precision=precision,
    )
    # pixel shuffle: [B, *S, (r...), Cout] -> interleave each spatial dim
    b = x.shape[0]
    s = x.shape[1:-1]
    y = y.reshape(b, *s, *((2,) * nsp), cout)
    perm = [0]
    for d in range(nsp):
        perm += [1 + d, 1 + nsp + d]
    perm += [1 + 2 * nsp]
    return y.transpose(perm).reshape(b, *[2 * e for e in s], cout)
