"""Parallelism layer: device mesh, shardings, distributed train-step wiring."""

from .mesh import (
    create_mesh,
    create_multislice_mesh,
    batch_sharding,
    replicated_sharding,
    shard_params_for_model_axis,
    local_batch_to_global,
)

__all__ = [
    "create_mesh",
    "create_multislice_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_params_for_model_axis",
    "local_batch_to_global",
]
