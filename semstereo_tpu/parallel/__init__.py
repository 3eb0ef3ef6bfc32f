"""Mesh / sharding helpers for data-, disparity-plane and spatial-tile parallelism."""

from semstereo_tpu.parallel.mesh import (
    DATA_AXIS,
    DISP_AXIS,
    SPATIAL_AXIS,
    all_reduce_sum_tree,
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "DISP_AXIS",
    "SPATIAL_AXIS",
    "all_reduce_sum_tree",
    "batch_sharding",
    "make_mesh",
    "param_sharding_rules",
    "replicated",
    "shard_batch",
]
