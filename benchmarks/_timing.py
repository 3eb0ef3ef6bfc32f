"""Shared benchmark timing utilities.

Two quirks of the axon TPU tunnel shape everything here:
  * ``block_until_ready`` returns without waiting — synchronization must be
    forced by fetching data (a scalar reduction transfer);
  * per-dispatch round-trips cost ~tens of ms — measurements run the op N
    times inside ONE jitted ``lax.scan`` (optimization_barrier-chained so
    nothing is DCE'd) and use two-point calibration (T(n2)-T(n1))/(n2-n1)
    to cancel the fixed dispatch+fetch cost.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def device_sync(out) -> float:
    """Force completion by fetching a scalar derived from `out`."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


def scan_bench(fn, args, length: int):
    """jit a scan applying fn(*args) `length` times, each iteration genuinely
    data-dependent on the previous one.

    An optimization_barrier whose extra operand is dropped is NOT enough: XLA
    hoists the loop-invariant body out of the scan and the measurement
    collapses to one execution (observed on TPU).  Instead the first carry
    leaf absorbs ``1e-30 * out[0]`` — numerically a no-op (rounds away at any
    practical magnitude/dtype) but an un-provable identity, so every
    iteration must run.

    The perturbed carry leaf must be floating point — an int leaf would cast
    the 1e-30 bump to exactly 0 and XLA could hoist the loop-invariant body
    again — so the *smallest* inexact leaf of the carry is chosen (and
    asserted to exist): perturbing a large operand adds its full read+write
    HBM traffic to every iteration (e.g. +0.24 ms/iter on a 100 MB conv
    input), polluting the measurement."""

    flat0 = jax.tree_util.tree_leaves(args)
    inexact = [
        i for i, x in enumerate(flat0)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
    ]
    assert inexact, "scan_bench needs at least one floating-point argument leaf"
    pi = min(inexact, key=lambda i: jnp.asarray(flat0[i]).size)

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry)
            # Barrier BEFORE the scalar extraction: without it XLA slices
            # through the producer (e.g. dot+slice -> vector dot) and the
            # body collapses to a cheap subexpression.
            leaf = jax.lax.optimization_barrier(jax.tree_util.tree_leaves(out)[0])
            s = leaf.ravel()[0]
            cflat, cdef = jax.tree_util.tree_flatten(carry)
            cflat[pi] = cflat[pi] + (s * 1e-30).astype(cflat[pi].dtype)
            return jax.tree_util.tree_unflatten(cdef, cflat), ()

        carry, _ = jax.lax.scan(body, args, None, length=length)
        return carry

    return run


def timed_calibrated(fn, args, n1: int = 4, n2: int = 16, repeats: int = 3) -> float:
    """Per-iteration seconds of fn(*args), fixed costs cancelled."""
    r1, r2 = scan_bench(fn, args, n1), scan_bench(fn, args, n2)
    device_sync(r1(args))  # compile
    device_sync(r2(args))

    def t(run):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            device_sync(run(args))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(r2) - t(r1)) / (n2 - n1), 1e-9)
