"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's single-process
``nn.DataParallel`` (+ unused NCCL scaffolding, /root/reference/utils/misc.py:20-41):
a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharding; gradients are
reduced by XLA-inserted collectives over ICI) and an optional ``disp`` axis
that shards cost-volume disparity planes / model tensors.

Everything below works identically on one chip, a multi-chip slice, or a
virtual ``--xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DISP_AXIS = "disp"


def make_mesh(data: int = -1, disp: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % disp == 0, (n, disp)
        data = n // disp
    assert data * disp <= n, (data, disp, n)
    grid = np.asarray(devices[: data * disp]).reshape(data, disp)
    return Mesh(grid, (DATA_AXIS, DISP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every array in a batch pytree."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over `data`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def param_sharding_rules(mesh: Mesh, params):
    """Parameter shardings: replicated by default (the model is ~40M params,
    far below HBM limits; data parallelism is the scaling axis).  Returns a
    pytree of NamedShardings matching ``params``."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)
