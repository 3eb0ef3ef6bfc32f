#!/usr/bin/env python
"""Per-kernel roofline microbenchmarks: cost-volume build and 3-D hourglass
convolutions at the flagship US3D shapes.

Reports achieved FLOP/s and bytes/s against the chip's speed-of-light
(defaults: TPU v5e — 394 bf16 TFLOP/s, 197 f32 TFLOP/s MXU, 819 GB/s HBM)
and the %roofline for each op, classifying each as compute- or
bandwidth-bound by its arithmetic intensity.

Usage:  python benchmarks/roofline.py [--batch 1] [--iters 20]
Prints one JSON line per kernel.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import timed_calibrated

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# TPU v5e speed-of-light (394e12 is the int8 figure; bf16 is 197).  A bf16
# 4096^3 matmul measures 186 TF/s here = 94% of this peak, confirming v5e.
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 98.5e12
PEAK_HBM_BPS = 819e9


def report(name, seconds, flops, bytes_moved, dtype):
    peak = PEAK_BF16_FLOPS if dtype == jnp.bfloat16 else PEAK_F32_FLOPS
    ai = flops / max(bytes_moved, 1)
    ridge = peak / PEAK_HBM_BPS
    bound = "compute" if ai >= ridge else "bandwidth"
    sol = flops / peak if bound == "compute" else bytes_moved / PEAK_HBM_BPS
    print(
        json.dumps(
            {
                "kernel": name,
                "ms": round(seconds * 1e3, 4),
                "tflops_achieved": round(flops / seconds / 1e12, 3),
                "gbps_achieved": round(bytes_moved / seconds / 1e9, 2),
                "arith_intensity": round(ai, 2),
                "bound": bound,
                "pct_roofline": round(100 * sol / seconds, 1),
            }
        )
    )


def bench_cost_volume(batch, iters, dtype):
    """GWC-norm volume at the US3D /8 shape: [B,128,128,256], D=16, G=32."""
    from semstereo_tpu.ops.cost_volume import gwc_volume_norm_xla
    from semstereo_tpu.ops.pallas.cost_volume_kernel import gwc_volume_norm_pallas

    b, h, w, c, d, g = batch, 128, 128, 256, 16, 32
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    right = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)

    flops = 2 * b * h * w * c * (d + 4)  # corr over D shifts + normalization
    bytes_io = (2 * b * h * w * c + b * d * h * w * g) * left.dtype.itemsize

    for name, impl in [
        ("cost_volume_xla", functools.partial(gwc_volume_norm_xla, max_shift=8, num_groups=32)),
        ("cost_volume_pallas", functools.partial(gwc_volume_norm_pallas, max_shift=8, num_groups=32)),
    ]:
        fn = jax.jit(lambda l, r, impl=impl: impl(l, r))
        t = timed_calibrated(fn, (left, right), n2=max(iters,8))
        report(name, t, flops, bytes_io, dtype)


def bench_hourglass(batch, iters, dtype):
    """Stage-2 hourglass2 at [B,24,256,256,32] — the FLOPs hot spot."""
    from semstereo_tpu.nn.hourglass import Hourglass3D

    b, d, h, w, c = batch, 24, 256, 256, 32
    model = Hourglass3D(32, (6, 4, 4))
    x = jnp.zeros((b, d, h, w, c), dtype)
    variables = jax.jit(lambda xx: model.init(jax.random.PRNGKey(0), xx))(x)
    if dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, variables
        )

    fn = jax.jit(lambda x: model.apply(variables, x))
    t = timed_calibrated(fn, (x,), n2=max(iters,8))

    # conv FLOPs: 2 * out_elems * K^3 * Cin per conv layer
    def conv_flops(dd, hh, ww, cin, cout, k=27):
        return 2 * b * dd * hh * ww * cout * k * cin

    flops = (
        conv_flops(d // 2, h // 2, w // 2, c, c * 2)        # conv1 s2
        + conv_flops(d // 2, h // 2, w // 2, c * 2, c * 2)  # conv2
        + conv_flops(d // 4, h // 4, w // 4, c * 2, c * 4)  # conv3 s2
        + conv_flops(d // 4, h // 4, w // 4, c * 4, c * 4)  # conv4
        + conv_flops(d // 2, h // 2, w // 2, c * 4, c * 2)  # conv5 deconv
        + conv_flops(d, h, w, c * 2, c)                     # conv6 deconv
        + conv_flops(d // 2, h // 2, w // 2, c * 2, c * 2, 1)  # redir2
        + conv_flops(d, h, w, c, c, 1)                      # redir1
    )
    bytes_io = 2 * b * d * h * w * c * x.dtype.itemsize
    report("hourglass2_3dconv", t, flops, bytes_io, dtype)


def bench_conv3d_single(batch, iters, dtype):
    """The 3x3x3 convs conv_nd dispatches to Pallas in the flagship graph
    (the W-in-lanes kernel, ops/pallas/conv3d_wl.py), XLA vs Pallas at each
    real model shape."""
    from jax import lax

    from semstereo_tpu.ops.pallas.conv3d_wl import conv3d_wl, supported

    shapes = [
        # (name, x_shape, F, stride)
        ("classif_conv0_s1", (batch, 24, 256, 256, 32), 32, 1),
        ("concat_stem_s1", (batch, 24, 256, 256, 64), 32, 1),
        ("hourglass_conv2_s1", (batch, 12, 128, 128, 64), 64, 1),
        ("hourglass_conv1_s2", (batch, 24, 256, 256, 32), 64, 2),
    ]
    rng = np.random.default_rng(0)
    for name, xs, cout, s in shapes:
        b, d, h, w, cin = xs
        x = jnp.asarray(rng.standard_normal(xs), dtype)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.01, dtype)
        od, oh, ow = d // s, h // s, w // s
        flops = 2 * b * od * oh * ow * cout * 27 * cin
        bytes_io = (x.size + k.size + b * od * oh * ow * cout) * x.dtype.itemsize

        xla = jax.jit(
            lambda x, k, s=s: lax.conv_general_dilated(
                x, k, (s,) * 3, [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        )
        t = timed_calibrated(xla, (x, k), n2=max(iters, 8))
        report(f"{name}_xla", t, flops, bytes_io, dtype)
        if supported(xs, k.shape, s):
            pal = jax.jit(lambda x, k, s=s: conv3d_wl(x, k, s, False))
            t = timed_calibrated(pal, (x, k), n2=max(iters, 8))
            report(f"{name}_pallas", t, flops, bytes_io, dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bench_cost_volume(args.batch, args.iters, dtype)
    bench_conv3d_single(args.batch, args.iters, dtype)
    bench_hourglass(args.batch, args.iters, dtype)


if __name__ == "__main__":
    main()
