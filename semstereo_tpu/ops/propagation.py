"""Fixed 5-tap spatial propagation (center + 4 diagonal neighbours).

The reference implements these as one-hot 3x3 convolutions over
replication-padded maps (/root/reference/models/submodule.py:290-307 for 2-D
maps, :361-377 for 5-D probability volumes).  On TPU a conv with one-hot
filters is wasted MXU work — the op is just five edge-clamped spatial shifts,
so we implement it with ``jnp.pad(mode='edge')`` + slicing (pure VPU moves
that XLA fuses into neighbours).

Tap order (must match between the disparity/confidence maps and the volume —
both multiply hypothesis-wise downstream): NW, C, SE, SW, NE, identical to the
reference's one-hot filter layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (dy, dx) offsets of the 5 taps, in reference filter order.
_TAPS = ((-1, -1), (0, 0), (1, 1), (1, -1), (-1, 1))


def _shifted(xp: jax.Array, dy: int, dx: int, h: int, w: int) -> jax.Array:
    """Slice an edge-padded [..., H+2, W+2] array at offset (dy, dx)."""
    return xp[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def propagate5(x: jax.Array) -> jax.Array:
    """x: [B, H, W] -> [B, 5, H, W]: the 5 propagated hypotheses."""
    b, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return jnp.stack([_shifted(xp, dy, dx, h, w) for dy, dx in _TAPS], axis=1)


def propagate5_volume(vol: jax.Array) -> jax.Array:
    """vol: [B, D, H, W] -> [B, 5, D, H, W]: spatially propagated volume
    (replication pad over H, W only, like ReplicationPad3d((1,1,1,1,0,0)))."""
    b, d, h, w = vol.shape
    vp = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    return jnp.stack([_shifted(vp, dy, dx, h, w) for dy, dx in _TAPS], axis=1)
