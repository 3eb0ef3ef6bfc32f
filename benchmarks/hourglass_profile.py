#!/usr/bin/env python
"""Layer-by-layer timing of the stage-2 hourglass at the US3D flagship shape
[B,24,256,256,32] — identifies which op class (strided conv3d, plain conv3d,
windowed MHSA, transposed conv3d, 1x1x1 redir) holds the time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks._timing import timed_calibrated  # noqa: E402
from semstereo_tpu.nn.attention import WindowedAttention3D  # noqa: E402
from semstereo_tpu.ops.convops import conv_nd, conv_transpose_nd  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)

    b, d, h, w, c = 1, 24, 256, 256, 32
    shapes = {
        # name: (in_shape, kernel_spatial, cin, cout, stride, deconv)
        "conv1_s2_32->64": ((b, d, h, w, c), 3, c, 2 * c, 2, False),
        "conv2_64": ((b, d // 2, h // 2, w // 2, 2 * c), 3, 2 * c, 2 * c, 1, False),
        "conv3_s2_64->128": ((b, d // 2, h // 2, w // 2, 2 * c), 3, 2 * c, 4 * c, 2, False),
        "conv4_128": ((b, d // 4, h // 4, w // 4, 4 * c), 3, 4 * c, 4 * c, 1, False),
        "deconv5_128->64": ((b, d // 4, h // 4, w // 4, 4 * c), 3, 4 * c, 2 * c, 2, True),
        "deconv6_64->32": ((b, d // 2, h // 2, w // 2, 2 * c), 3, 2 * c, c, 2, True),
        "redir1_1x1": ((b, d, h, w, c), 1, c, c, 1, False),
        "redir2_1x1": ((b, d // 2, h // 2, w // 2, 2 * c), 1, 2 * c, 2 * c, 1, False),
    }
    for name, (ishape, k, cin, cout, stride, deconv) in shapes.items():
        x = jnp.asarray(rng.standard_normal(ishape), dtype)
        kern = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)) * 0.01, dtype)
        if deconv:
            fn = lambda x, kern=kern: conv_transpose_nd(x, kern, 2, 1, 1)
        elif k == 1:
            fn = lambda x, kern=kern: conv_nd(x, kern, 1, 0)
        else:
            fn = lambda x, kern=kern, stride=stride: conv_nd(x, kern, stride, 1)
        t = timed_calibrated(fn, (x,), n2=max(args.iters, 8))
        out_sp = [s // stride for s in ishape[1:4]] if not deconv else [s * 2 for s in ishape[1:4]]
        flops = 2 * b * int(np.prod(out_sp)) * cout * (k ** 3) * cin
        print(json.dumps({"layer": name, "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 2)}))

    # windowed attention at the bottleneck [B, 6, 64, 64, 128]
    att = WindowedAttention3D(16, (6, 4, 4))
    xa = jnp.asarray(rng.standard_normal((b, 6, 64, 64, 128)), dtype)
    va = att.init(jax.random.PRNGKey(0), xa)
    if dtype != jnp.float32:
        va = jax.tree_util.tree_map(lambda v: v.astype(dtype), va)
    t = timed_calibrated(lambda x: att.apply(va, x), (xa,), n2=max(args.iters, 8))
    print(json.dumps({"layer": "attention_6x4x4", "ms": round(t * 1e3, 3)}))


if __name__ == "__main__":
    main()
