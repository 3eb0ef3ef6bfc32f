#!/usr/bin/env python
"""Experiment round 2: why are stride-2 3-D convs at <4% of peak?

Isolations and reformulations at the two hourglass entry shapes:
  * raw 2-D stride-2 conv at the equivalent shape (is it 3-D-specific?)
  * channel-padded native 3-D (is it the C=32 lane underfill?)
  * phase-packed stride-2: pack 2x2x2 input phases into channels ->
    dense stride-1 (2,2,2) conv with 8*C input channels (2.37x MACs but
    128+-lane-wide operands)
  * im2col: conv_general_dilated_patches + one big matmul
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from benchmarks._timing import timed_calibrated

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12


def conv3d_native(x, k):
    return lax.conv_general_dilated(
        x, k, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_phase_packed(x, k):
    """Pack input into 2x2x2 phase channels; stride-2 k3 conv becomes a
    stride-1 k2 conv over the packed grid.  Output o reads input 2o+t-1,
    t in {0,1,2}: packed col offsets {-1(phase1 tap0), 0(phase0 tap1,
    phase1 tap2)} per dim -> kernel (2,2,2) with 8*Cin channels (row blocks
    ordered phase-major), structurally zero where (col,phase) has no tap."""
    b, d, h, w, c = x.shape
    kd, kh, kw, _, cout = k.shape
    assert (kd, kh, kw) == (3, 3, 3)
    xp = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2, w // 2, 8 * c)
    # packed kernel [2,2,2, 8*C, Cout]
    ku = np.zeros((2, 2, 2, 8, c, cout), np.float32)
    ku = jnp.asarray(ku, k.dtype)
    # per-dim (tap, col_offset, phase): tap0 -> (col -1, ph 1); tap1 -> (0, 0); tap2 -> (0, 1)
    dim_map = [(0, -1, 1), (1, 0, 0), (2, 0, 1)]
    for td, cd, pd in dim_map:
        for th, ch_, ph_ in dim_map:
            for tw, cw, pw in dim_map:
                ku = ku.at[cd + 1, ch_ + 1, cw + 1, pd * 4 + ph_ * 2 + pw].set(
                    k[td, th, tw]
                )
    ku = ku.reshape(2, 2, 2, 8 * c, cout)
    y = lax.conv_general_dilated(
        xp, ku, (1, 1, 1), [(1, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y


def conv3d_im2col(x, k):
    b, d, h, w, c = x.shape
    kd, kh, kw, _, cout = k.shape
    patches = lax.conv_general_dilated_patches(
        x, (kd, kh, kw), (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # [B, OD, OH, OW, C*kd*kh*kw] (feature-major ordering: c outer? check)
    od, oh, ow = patches.shape[1:4]
    kk = k.transpose(3, 0, 1, 2, 4).reshape(c * kd * kh * kw, cout)
    y = jnp.dot(patches.reshape(-1, patches.shape[-1]), kk)
    return y.reshape(b, od, oh, ow, cout)


def main():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    shapes = [
        ("s2_in", 1, 24, 256, 256, 32, 64),
        ("att_stage1", 1, 16, 128, 128, 32, 64),
    ]
    for name, b, d, h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), dtype)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dtype)
        od, oh, ow = d // 2, h // 2, w // 2
        flops = 2 * b * od * oh * ow * cout * 27 * cin

        ref = np.asarray(jax.jit(conv3d_native)(x, k), np.float32)

        # raw 2-D stride-2 conv at the folded shape (no depth taps at all —
        # not the same math, just the per-2D-conv speed ceiling)
        x2 = x.reshape(b * d, h, w, cin)
        k2 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype)
        fn2 = jax.jit(
            lambda x2, k2: lax.conv_general_dilated(
                x2, k2, (2, 2), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        t = timed_calibrated(fn2, (x2, k2), n2=24)
        f2 = 2 * b * d * oh * ow * cout * 9 * cin
        print(json.dumps({"shape": name, "impl": "conv2d_only", "ms": round(t * 1e3, 3),
                          "pct_peak": round(100 * f2 / t / PEAK, 1)}))

        for impl_name, impl in [
            ("native", conv3d_native),
            ("phase_packed", conv3d_phase_packed),
            ("im2col", conv3d_im2col),
        ]:
            fn = jax.jit(impl)
            got = np.asarray(fn(x, k), np.float32)
            err = np.max(np.abs(got - ref)) / max(np.abs(ref).max(), 1e-6)
            assert err < 2e-2, (name, impl_name, err)
            t = timed_calibrated(fn, (x, k), n2=24)
            print(json.dumps({"shape": name, "impl": impl_name, "ms": round(t * 1e3, 3),
                              "tflops": round(flops / t / 1e12, 2),
                              "pct_peak": round(100 * flops / t / PEAK, 1)}))


if __name__ == "__main__":
    main()
