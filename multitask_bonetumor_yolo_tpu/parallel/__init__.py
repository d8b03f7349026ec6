"""Mesh + sharding: the TPU-native replacement for Lightning DDP/NCCL."""

from .mesh import create_mesh, shard_batch, replicate, data_sharding
from .pack import BatchPacker

__all__ = [
    "create_mesh", "shard_batch", "replicate", "data_sharding", "BatchPacker",
]
