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


# Batch keys whose axis 1 is image height (shardable over `space`).  Explicit
# so a future rank>=3 key with a non-spatial axis 1 (e.g. [B, K, C]) is never
# silently mis-sharded.
SPATIAL_KEYS = frozenset(
    {
        "left", "right", "disparity", "disparity_4", "disparity_8",
        "disparity_16", "label", "label_2", "label_4", "gx", "gy",
    }
)


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Device-put a host batch: batch axis over ``data``; with ``spatial``,
    height (axis 1) of every known image-like key over ``space``."""
    s = batch_sharding(mesh, spatial)
    flat = batch_sharding(mesh, False)
    n_space = mesh.shape[SPATIAL_AXIS]

    def put(path, x):
        key = path[-1].key if path and hasattr(path[-1], "key") else None
        if spatial and x.ndim >= 3 and key in SPATIAL_KEYS:
            assert x.shape[1] % n_space == 0, (
                f"batch['{key}'] height {x.shape[1]} is not divisible by the "
                f"mesh 'space' axis ({n_space}); pad H or shrink the axis"
            )
            return jax.device_put(x, s)
        return jax.device_put(x, flat)

    return jax.tree_util.tree_map_with_path(put, batch)


def param_sharding_rules(mesh: Mesh, params):
    """Parameter shardings: replicated by default (the model is ~40M params,
    far below HBM limits; data parallelism is the scaling axis).  Returns a
    pytree of NamedShardings matching ``params``."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)
