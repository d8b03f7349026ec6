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


def shard_batch(batch: Dict, mesh: Mesh, streams: Optional[int] = None) -> Dict:
    """Upload a host batch with each leaf's leading dim sharded over 'data'.

    The leading (batch) dim must divide the data-axis size — the Trainer
    guarantees this by scaling the global batch to per-device x n_devices
    (reference analogue: Lightning DDP's per-process batch_size,
    running_main_v3.py:746-766, :824-828) and by pad_last batches being
    padded to the full global batch. Anything else fails loudly here rather
    than deep inside device_put.

    The upload rides ONE packed transfer (parallel/pack.py) instead of a
    device_put per leaf — the relay's ~29 ms fixed per-transfer cost made
    leaf-wise upload (~200 ms/batch-8) dominate the train step itself.

    ``streams`` (default ``DataConfig.upload_streams`` = 4) splits the
    packed buffer across that many concurrent relay transfers — the relay's
    per-stream throughput is the cold-upload wall (BASELINE.md eval table);
    MTBY_UPLOAD_STREAMS remains an experiment-only env override that
    warns."""
    n_data = mesh.shape["data"]
    sizes = {k: np.shape(v)[0] for k, v in batch.items() if np.ndim(v)}
    bad = {k: s for k, s in sizes.items() if s % n_data}
    if bad:
        raise ValueError(
            f"batch dims {bad} not divisible by data-axis size {n_data}; "
            f"use a per-device batch size (global = per_device * {n_data}) "
            f"or a pad_last loader"
        )
    if streams is None:
        from ..utils.knobs import env_override

        streams = env_override("MTBY_UPLOAD_STREAMS", DEFAULT_UPLOAD_STREAMS)
    key = (id(mesh), int(streams))
    packer = _packer_cache.get(key)
    if packer is None or packer.mesh is not mesh:
        from .pack import BatchPacker

        packer = BatchPacker(mesh, streams=int(streams))
        _packer_cache[key] = packer
    return packer(batch)


DEFAULT_UPLOAD_STREAMS = 4

_packer_cache: Dict[tuple, "object"] = {}
