"""Device mesh + sharding helpers.

The reference's (latent) distribution story is Lightning DDP over NCCL
(SURVEY.md §2.2: ``Trainer(devices="auto")`` + ``dist_sync_on_step`` metrics).
The TPU-native equivalent is a ``jax.sharding.Mesh`` with the batch sharded
over a ``data`` axis: gradients and loss reductions become XLA collectives
over ICI compiled straight out of sharded ``jit`` — no hand-written
communication layer.

A second ``model`` axis is plumbed through so tensor-parallel sharding is a
config change (SURVEY.md §2.2 TP row), though the ~50M-param CNN never needs
it; all shipped configs use a 1-D data mesh.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    model_parallel: int = 1,
) -> Mesh:
    """1-D data mesh by default; pass model_parallel>1 for a 2-D layout."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % model_parallel:
        raise ValueError("n_devices must divide by model_parallel")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Device-put every array with its leading dim sharded over 'data'."""
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
