#!/usr/bin/env python
"""Dump the optimized HLO of the flagship eval forward (same construction as
bench.py, so the persistent cache hits) and attribute named ops — the copies
the profile surfaces as `copy.NNNN` — to shapes and python source locations.

    python benchmarks/hlo_dump.py --ops copy.2681 copy.2908 ...
    python benchmarks/hlo_dump.py --kind copy --min-bytes 8000000
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(height, width, batch, dtype_str):
    import numpy as np

    from semstereo_tpu.models import SemStereo

    model = SemStereo(maxdisp=64, num_classes=6)
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    shape = (batch, height, width, 3)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    right = jnp.asarray(np.roll(np.asarray(left), 8, axis=2))
    init = jax.jit(lambda l, r: model.init(jax.random.PRNGKey(0), l, r, train=False))
    variables = init(left, right)
    if dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables
        )
        left, right = left.astype(dtype), right.astype(dtype)

    @jax.jit
    def forward(left, right):
        return model.apply(variables, left, right, train=False)["disp"][0]

    return forward, left, right


_SHAPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "pred": 1, "u32": 4, "f16": 2}


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    elt = _SHAPE_BYTES.get(m.group(1), 4)
    dims = [int(x) for x in m.group(2).split(",") if x]
    n = 1
    for v in dims:
        n *= v
    return n * elt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--ops", nargs="*", default=[])
    p.add_argument("--kind", default=None, help="e.g. copy / pad / fusion")
    p.add_argument("--min-bytes", type=int, default=4_000_000)
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    fwd, left, right = build(args.height, args.width, args.batch, args.dtype)
    txt = fwd.lower(left, right).compile().as_text()
    print(f"# HLO text: {len(txt)} chars", file=sys.stderr)

    want = set(args.ops)
    rows = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(\S+)\s+(\w+)\(", line)
        if not m:
            continue
        name, shape, kind = m.groups()
        if want and name in want:
            rows.append((shape_bytes(shape), name, shape, line.strip()[:400]))
            continue
        if args.kind and kind == args.kind:
            b = shape_bytes(shape)
            if b >= args.min_bytes:
                rows.append((b, name, shape, line.strip()[:400]))
    rows.sort(reverse=True)
    for b, name, shape, line in rows[: args.top]:
        meta = re.search(r'metadata=\{[^}]*\}', line)
        src = ""
        if meta:
            sm = re.search(r'op_name="([^"]*)"', meta.group(0))
            fm = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', meta.group(0))
            src = (sm.group(1) if sm else "")[:160]
            if fm:
                src += f"  [{os.path.basename(fm.group(1))}:{fm.group(2)}]"
        print(f"{b/1e6:8.1f} MB  {name:12s} {shape}  {src}")


if __name__ == "__main__":
    main()
