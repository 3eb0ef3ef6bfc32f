#!/usr/bin/env python
"""Experiment round 4: honest (fixed-timing) native-XLA numbers for every
conv in the two hourglasses + the deconvs, at stage-2 US3D shapes."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from benchmarks._timing import timed_calibrated
from semstereo_tpu.ops.convops import conv_nd, conv_transpose_nd

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12


def run_conv(name, b, d, h, w, cin, cout, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, jnp.bfloat16)
    fn = jax.jit(lambda x, k: conv_nd(x, k, stride=stride, padding=1))
    t = timed_calibrated(fn, (x, k), n2=32)
    od, oh, ow = d // stride, h // stride, w // stride
    flops = 2 * b * od * oh * ow * cout * 27 * cin
    print(json.dumps({"case": name, "ms": round(t * 1e3, 3),
                      "pct_peak": round(100 * flops / t / PEAK, 1)}))


def run_deconv(name, b, d, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, jnp.bfloat16)
    fn = jax.jit(lambda x, k: conv_transpose_nd(x, k, 2, 1, output_padding=1))
    t = timed_calibrated(fn, (x, k), n2=32)
    flops = 2 * b * d * h * w * 8 * cout * 8 * cin  # phase path: L~2^3, 8 phases
    flops = 2 * b * (2 * d) * (2 * h) * (2 * w) * cout * 27 * cin / 8 * 8  # true macs
    print(json.dumps({"case": name, "ms": round(t * 1e3, 3),
                      "pct_peak": round(100 * flops / t / PEAK, 1)}))


def main():
    # stage-2 hourglass2 at [1,24,256,256,32]
    run_conv("hg2_conv1_s2_32_64", 1, 24, 256, 256, 32, 64, 2)
    run_conv("hg2_conv2_s1_64_64", 1, 12, 128, 128, 64, 64, 1)
    run_conv("hg2_conv3_s2_64_128", 1, 12, 128, 128, 64, 128, 2)
    run_conv("hg2_conv4_s1_128_128", 1, 6, 64, 64, 128, 128, 1)
    run_deconv("hg2_conv5_T_128_64", 1, 6, 64, 64, 128, 64)
    run_deconv("hg2_conv6_T_64_32", 1, 12, 128, 128, 64, 32)
    # stage-1 hourglass at [1,16,128,128,32]
    run_conv("hg1_conv1_s2_32_64", 1, 16, 128, 128, 32, 64, 2)
    run_conv("hg1_conv2_s1_64_64", 1, 8, 64, 64, 64, 64, 1)


if __name__ == "__main__":
    main()
