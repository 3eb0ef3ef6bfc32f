"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's single-process
``nn.DataParallel`` (+ unused NCCL scaffolding, /root/reference/utils/misc.py:20-41):
a ``jax.sharding.Mesh`` with

* a ``data`` axis — batch sharding; gradients are reduced by XLA-inserted
  collectives over ICI;
* an optional ``disp`` axis — shards cost-volume disparity planes (tensor
  parallelism for the volume pipeline);
* an optional ``space`` axis — shards the image/volume HEIGHT dimension
  (spatial-tile parallelism, the context-parallel analog for 1024x1024
  remote-sensing tiles, SURVEY.md section 5: GSPMD inserts the halo
  exchanges convolutions need at tile borders automatically).

Everything below works identically on one chip, a multi-chip slice, or a
virtual ``--xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DISP_AXIS = "disp"
SPATIAL_AXIS = "space"


def make_mesh(data: int = -1, disp: int = 1, space: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (disp * space) == 0, (n, disp, space)
        data = n // (disp * space)
    assert data * disp * space <= n, (data, disp, space, n)
    grid = np.asarray(devices[: data * disp * space]).reshape(data, disp, space)
    return Mesh(grid, (DATA_AXIS, DISP_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Shard the leading (batch) axis of every array in a batch pytree; with
    ``spatial`` also shard the following (height) axis over ``space``."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Device-put a host batch: batch axis over ``data``, optionally height
    (axis 1 of every [B, H, ...] array) over ``space``."""
    s = batch_sharding(mesh, spatial)
    flat = batch_sharding(mesh, False)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s if (spatial and x.ndim >= 3) else flat), batch
    )


def param_sharding_rules(mesh: Mesh, params):
    """Parameter shardings: replicated by default (the model is ~40M params,
    far below HBM limits; data parallelism is the scaling axis).  Returns a
    pytree of NamedShardings matching ``params``."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)
