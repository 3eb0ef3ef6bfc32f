#!/usr/bin/env python
"""Experiment round 3: isolate WHICH property makes the hourglass entry convs
slow on TPU — stride, channel width, spatial size, dtype — using 2-D convs
(round 2 showed 2-D is as slow as 3-D at the bad shapes).
"""

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

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(name, b, h, w, cin, cout, k, stride, dtype):
    peak = 197e12 if dtype == jnp.bfloat16 else 98.5e12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dtype)
    kk = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, dtype)
    fn = jax.jit(
        lambda x, kk: lax.conv_general_dilated(
            x, kk, (stride, stride), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    t = timed_calibrated(fn, (x, kk), n2=32)
    oh, ow = h // stride, w // stride
    flops = 2 * b * oh * ow * cout * k * k * cin
    bytes_io = (x.size + kk.size + b * oh * ow * cout) * x.dtype.itemsize
    print(json.dumps({
        "case": name, "ms": round(t * 1e3, 3),
        "pct_peak": round(100 * flops / t / peak, 1),
        "gbps": round(bytes_io / t / 1e9, 1),
    }))


def main():
    bf, f32 = jnp.bfloat16, jnp.float32
    cases = [
        # name,                 b,  h,   w,  cin, cout, k, s, dtype
        ("s2_c32_bf16",        24, 256, 256, 32,  64, 3, 2, bf),
        ("s2_c32_f32",         24, 256, 256, 32,  64, 3, 2, f32),
        ("s1_c32_bf16",        24, 256, 256, 32,  64, 3, 1, bf),
        ("s2_c64_bf16",        24, 256, 256, 64,  64, 3, 2, bf),
        ("s2_c128_bf16",       24, 256, 256, 128, 64, 3, 2, bf),
        ("s2_c128_c128_bf16",  24, 256, 256, 128, 128, 3, 2, bf),
        ("s2_c32_k1_bf16",     24, 256, 256, 32,  64, 1, 2, bf),
        ("s2_c32_small_bf16",  24, 128, 128, 32,  64, 3, 2, bf),
        ("s1_c32_cout256",     24, 256, 256, 32, 256, 3, 1, bf),
        ("s2_c32_cout256",     24, 256, 256, 32, 256, 3, 2, bf),
    ]
    for c in cases:
        run(*c)


if __name__ == "__main__":
    main()
