#!/usr/bin/env python
"""Experiment: alternative lowerings for the 3-D convs (hourglass hot spot).

Candidates at the stage-2 stride-2 shape [1,24,256,256,32] -> [1,12,128,128,64]:
  a) native NDHWC conv_general_dilated (current)
  b) depth-tap decomposition: 3 stacked 2-D convs on D-shifted slices, summed
  c) depth-concat: concat 3 D-shifted slices on C, one 2-D conv with 3x(3,3,Cin)
  d) same as (c) but stride-2 in D handled by slicing even planes first
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from benchmarks._timing import timed_calibrated

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12


def conv3d_native(x, k, stride, padding):
    nsp = 3
    return lax.conv_general_dilated(
        x, k, (stride,) * nsp, [(padding, padding)] * nsp,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_depth_taps(x, k, stride, padding):
    """b) sum of KD 2-D convs over D-shifted input slices.

    x: [B,D,H,W,C], k: [KD,KH,KW,Cin,Cout]. Output depth planes
    od*stride + kd - padding index the input depth.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = k.shape
    od = (d + 2 * padding - kd) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(kd):
        # input depth planes for tap t: start=t, strided
        xs = lax.slice_in_dim(xp, t, t + (od - 1) * stride + 1, stride, axis=1)
        xs2 = xs.reshape(b * od, h, w, cin)
        y = lax.conv_general_dilated(
            xs2, k[t], (stride, stride), [(padding, padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    oh, ow = out.shape[1:3]
    return out.reshape(b, od, oh, ow, cout)


def conv3d_depth_concat(x, k, stride, padding):
    """c) concat KD D-shifted slices on channels; one 2-D conv."""
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = k.shape
    od = (d + 2 * padding - kd) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0), (0, 0), (0, 0)))
    slabs = [
        lax.slice_in_dim(xp, t, t + (od - 1) * stride + 1, stride, axis=1)
        for t in range(kd)
    ]
    xc = jnp.concatenate(slabs, axis=-1).reshape(b * od, h, w, kd * cin)
    kc = k.reshape(kd, kh, kw, cin, cout).transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * cin, cout)
    y = lax.conv_general_dilated(
        xc, kc, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    oh, ow = y.shape[1:3]
    return y.reshape(b, od, oh, ow, cout)


def main():
    dtype = jnp.bfloat16
    shapes = [
        # (name, b, d, h, w, cin, cout, stride)
        ("s2_in", 1, 24, 256, 256, 32, 64, 2),
        ("s1_mid", 1, 12, 128, 128, 64, 64, 1),
        ("s2_deep", 1, 12, 128, 128, 64, 128, 2),
        ("s1_deep", 1, 6, 64, 64, 128, 128, 1),
        ("att_stage1", 1, 16, 128, 128, 32, 64, 2),
    ]
    rng = np.random.default_rng(0)
    for name, b, d, h, w, cin, cout, stride in shapes:
        x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), dtype)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dtype)
        od = (d + 2 - 3) // stride + 1
        flops = 2 * b * od * (h // stride) * (w // stride) * cout * 27 * cin
        ref = None
        for impl_name, impl in [
            ("native", conv3d_native),
            ("taps", conv3d_depth_taps),
            ("concat", conv3d_depth_concat),
        ]:
            fn = jax.jit(functools.partial(impl, stride=stride, padding=1))
            out = fn(x, k)
            if ref is None:
                ref = np.asarray(out, np.float32)
            else:
                got = np.asarray(out, np.float32)
                err = np.max(np.abs(got - ref)) / max(np.abs(ref).max(), 1e-6)
                assert err < 2e-2, (name, impl_name, err)
            t = timed_calibrated(fn, (x, k), n2=12)
            print(json.dumps({
                "shape": name, "impl": impl_name, "ms": round(t * 1e3, 3),
                "tflops": round(flops / t / 1e12, 2),
                "pct_peak": round(100 * flops / t / PEAK, 1),
            }))


if __name__ == "__main__":
    main()
