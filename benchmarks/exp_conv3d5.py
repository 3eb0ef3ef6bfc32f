#!/usr/bin/env python
"""Experiment round 5 (fixed timing): reformulations of the stride-2 Cin=32
hourglass entry convs — the one shape class XLA handles catastrophically
(4.6% peak; stride-1 C>=64 convs reach 43-69%)."""

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
from benchmarks.exp_conv3d import conv3d_depth_concat, conv3d_depth_taps, conv3d_native

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12


def conv3d_hw_fold(x, k, stride, padding):
    """Fold the H/W stride-2 phases into channels: [B,D,H,W,C] ->
    [B,D,H/2,W/2,4C]; the (3,3,3) s2 conv becomes a (3,2,2) s(2,1,1) conv on
    the folded layout with a phase-structured (4/3)^2-dense kernel."""
    b, d, h, w, c = x.shape
    kd, kh, kw, _, cout = k.shape
    assert stride == 2 and (kd, kh, kw) == (3, 3, 3) and padding == 1
    xp = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    xp = xp.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, d, h // 2, w // 2, 4 * c)
    # folded kernel [3, 2, 2, 4C, Cout]; per dim (tap -> col, phase):
    # 0 -> (-1, 1);  1 -> (0, 0);  2 -> (0, 1); cols {-1,0} -> pad (1, 0)
    ku = np.zeros((3, 2, 2, 2, 2, c, cout), np.float32)
    ku = jnp.asarray(ku, k.dtype)
    dim_map = [(0, -1, 1), (1, 0, 0), (2, 0, 1)]
    for th, ch_, ph in dim_map:
        for tw, cw, pw in dim_map:
            ku = ku.at[:, ch_ + 1, cw + 1, ph, pw].set(k[:, th, tw])
    ku = ku.reshape(3, 2, 2, 4 * c, cout)
    return lax.conv_general_dilated(
        xp, ku, (2, 1, 1), [(1, 1), (1, 0), (1, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_dhw_fold(x, k, stride, padding):
    """Fold D, H and W phases: [B,D,H,W,C] -> [B,D/2,H/2,W/2,8C]; the conv
    becomes a fully stride-1 (2,2,2) conv with an (4/3)^3-dense kernel and
    8C=256 input channels."""
    b, d, h, w, c = x.shape
    kd, kh, kw, _, cout = k.shape
    assert stride == 2 and (kd, kh, kw) == (3, 3, 3) and padding == 1
    xp = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, w // 2, 8 * c
    )
    ku = np.zeros((2, 2, 2, 2, 2, 2, c, cout), np.float32)
    ku = jnp.asarray(ku, k.dtype)
    dim_map = [(0, -1, 1), (1, 0, 0), (2, 0, 1)]
    for td, cd, pd in dim_map:
        for th, ch_, ph in dim_map:
            for tw, cw, pw in dim_map:
                ku = ku.at[cd + 1, ch_ + 1, cw + 1, pd, ph, pw].set(k[td, th, tw])
    ku = ku.reshape(2, 2, 2, 8 * c, cout)
    return lax.conv_general_dilated(
        xp, ku, (1, 1, 1), [(1, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def main():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    shapes = [
        ("hg2_conv1", 1, 24, 256, 256, 32, 64),
        ("hg1_conv1", 1, 16, 128, 128, 32, 64),
        ("hg2_conv3", 1, 12, 128, 128, 64, 128),
    ]
    for name, b, d, h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), dtype)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dtype)
        flops = 2 * b * (d // 2) * (h // 2) * (w // 2) * cout * 27 * cin
        ref = None
        for impl_name, impl in [
            ("native", conv3d_native),
            ("taps", conv3d_depth_taps),
            ("concat", conv3d_depth_concat),
            ("hw_fold", conv3d_hw_fold),
            ("dhw_fold", conv3d_dhw_fold),
        ]:
            fn = jax.jit(functools.partial(impl, stride=2, padding=1))
            got = np.asarray(fn(x, k), np.float32)
            if ref is None:
                ref = got
            else:
                err = np.max(np.abs(got - ref)) / max(np.abs(ref).max(), 1e-6)
                assert err < 2e-2, (name, impl_name, err)
            t = timed_calibrated(fn, (x, k), n2=32)
            print(json.dumps({"shape": name, "impl": impl_name,
                              "ms": round(t * 1e3, 3),
                              "pct_peak": round(100 * flops / t / PEAK, 1)}))


if __name__ == "__main__":
    main()
