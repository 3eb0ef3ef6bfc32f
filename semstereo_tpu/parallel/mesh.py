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
    """Assemble a host batch into global device arrays: batch axis over
    ``data``; with ``spatial``, height (axis 1) of every known image-like key
    over ``space``.

    Single-process: a plain sharded ``device_put``.  Multi-process
    (``jax.process_count() > 1``): each host holds only its slice of the
    global batch (the loader shards the sample list by ``process_index``), so
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the TPU-native analog of the
    reference's per-rank DistributedSampler feeding
    (/root/reference/utils/misc.py:20-41).  The global batch axis is
    ``local_batch * process_count``; non-batch sharded axes (``space``) must
    not span processes (height halos would cross DCN every conv)."""
    s = batch_sharding(mesh, spatial)
    flat = batch_sharding(mesh, False)
    n_space = mesh.shape[SPATIAL_AXIS]
    multiproc = jax.process_count() > 1

    def put(path, x):
        key = path[-1].key if path and hasattr(path[-1], "key") else None
        sharding = flat
        if spatial and x.ndim >= 3 and key in SPATIAL_KEYS:
            assert x.shape[1] % n_space == 0, (
                f"batch['{key}'] height {x.shape[1]} is not divisible by the "
                f"mesh 'space' axis ({n_space}); pad H or shrink the axis"
            )
            sharding = s
        if multiproc:
            global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map_with_path(put, batch)


def all_reduce_sum_tree(tree):
    """Sum a pytree of host numpy values across processes (no-op single
    process) — the TPU-native analog of the reference's
    ``reduce_scalar_outputs`` (/root/reference/utils/experiment.py:231-258),
    used to aggregate eval meters/confusion matrices over host-sharded eval
    data.  Uses a psum over a 1-device-per-process slice of the global mesh
    via multihost_utils (DCN collective)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        jax.tree_util.tree_map(np.asarray, tree)
    )
    return jax.tree_util.tree_map(lambda x: np.asarray(x).sum(axis=0), gathered)


def param_sharding_rules(mesh: Mesh, params):
    """Parameter shardings: replicated by default (the model is ~40M params,
    far below HBM limits; data parallelism is the scaling axis).  Returns a
    pytree of NamedShardings matching ``params``."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)
