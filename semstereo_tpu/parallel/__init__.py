"""Mesh / sharding helpers for data- and disparity-plane parallelism."""

from semstereo_tpu.parallel.mesh import (
    DATA_AXIS,
    DISP_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "DISP_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_sharding_rules",
    "replicated",
    "shard_batch",
]
