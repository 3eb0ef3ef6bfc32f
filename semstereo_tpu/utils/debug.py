"""Debug/observability subsystem: profiler traces, NaN guards, jit-vs-eager
parity checking.

The reference has no tracing or sanitizers (only per-iteration wall-time
prints, /root/reference/main_us3d.py:136,144 — SURVEY.md section 5); this
module supplies the TPU-native equivalents.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/semstereo_trace"):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN detection: any NaN produced inside raises immediately."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite_tree(tree, name: str = "tree") -> None:
    """Host-side guard: assert every array leaf in a pytree is finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    assert not bad, f"non-finite values in {name}: {bad}"


def jit_eager_parity(fn: Callable, *args, rtol: float = 1e-4, atol: float = 1e-5):
    """Run fn jitted and eagerly; assert outputs match.  Catches tracing bugs
    (wrong static capture, python side effects under jit)."""
    eager = fn(*args)
    with jax.disable_jit():
        pass  # ensure no stale cache interplay
    jitted = jax.jit(fn)(*args)

    def cmp(a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)

    jax.tree_util.tree_map(cmp, eager, jitted)
    return jitted
