"""Single-transfer batch upload.

The TPU relay in this environment charges a ~29 ms fixed round trip per
host->device transfer, so uploading a training batch dict leaf-by-leaf
(7 arrays) costs ~200 ms/batch — 2x the whole train step. This module
packs every leaf into ONE uint8 buffer on the host (cheap memcpy),
ships it in a single ``jax.device_put``, and re-materialises the dict
inside one jitted unpack (slice + bitcast + reshape: zero-FLOP, fused
by XLA, layout-local under data-parallel sharding).

Reference analogue: the torch DataLoader's ``pin_memory`` + single
``cuda(non_blocking=True)`` stream (running_main_v3.py:755-766); here
the batching of transfers is the part that matters because the relay
cost is per-call, not per-byte.

The packed layout is shard-major: leaves are first reshaped to
``[n_shards, per_shard_bytes]`` and concatenated on axis 1, so placing
the buffer with a ``P("data")`` sharding moves exactly each device's
bytes to it, and every unpack op is batch-dim local (no collectives).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# spec: ((key, dtype_str, shape), ...) sorted by key — static per batch shape
Spec = Tuple[Tuple[str, str, Tuple[int, ...]], ...]


_CANON = {
    np.dtype(np.float64): np.float32,
    np.dtype(np.int64): np.int32,
    np.dtype(np.uint64): np.uint32,
    np.dtype(np.complex128): np.complex64,
}


def _canonical(v: np.ndarray) -> np.ndarray:
    tgt = _CANON.get(v.dtype)
    return v.astype(tgt) if tgt is not None else v


def _spec_of(batch: Dict[str, np.ndarray]) -> Spec:
    return tuple(
        (k, np.dtype(batch[k].dtype).str, tuple(np.shape(batch[k])))
        for k in sorted(batch)
    )


def _pack_host(batch: Dict[str, np.ndarray], n_shards: int) -> np.ndarray:
    parts = []
    for k in sorted(batch):
        v = np.ascontiguousarray(batch[k])
        if v.ndim < 1 or v.shape[0] % n_shards:
            raise ValueError(
                f"batch['{k}'] leading dim {v.shape} not divisible by "
                f"data-axis size {n_shards}"
            )
        parts.append(v.view(np.uint8).reshape(n_shards, -1))
    return np.concatenate(parts, axis=1)


def _make_unpack(spec: Spec, n_shards: int):
    def unpack(buf: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {}
        off = 0
        for k, dt, shape in spec:
            dtype = np.dtype(dt)
            nbytes = math.prod(shape) * dtype.itemsize // n_shards
            seg = buf[:, off : off + nbytes]
            off += nbytes
            if dtype == np.bool_:
                arr = (seg != 0).reshape(shape)
            elif dtype.itemsize == 1:
                arr = seg.astype(jnp.dtype(dt)).reshape(shape)
            else:
                arr = lax.bitcast_convert_type(
                    seg.reshape(n_shards, -1, dtype.itemsize), jnp.dtype(dt)
                ).reshape(shape)
            out[k] = arr
        return out

    return unpack


class BatchPacker:
    """Packs host batch dicts into one device transfer.

    ``mesh=None`` targets the default device; with a mesh, the buffer is
    placed shard-major over the ``data`` axis and the unpacked leaves come
    out sharded ``P("data")`` on their leading dim.
    """

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh
        self.n_shards = mesh.shape["data"] if mesh is not None else 1
        self._unpack_cache: Dict[Spec, object] = {}

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        # canonicalize 64-bit hosts dtypes the way jnp.asarray would
        # (x64 is disabled in JAX by default)
        batch = {k: _canonical(np.asarray(v)) for k, v in batch.items()}
        spec = _spec_of(batch)
        fn = self._unpack_cache.get(spec)
        if fn is None:
            if self.mesh is not None:
                sh = NamedSharding(self.mesh, P("data", None))
                out_sh = NamedSharding(self.mesh, P("data"))
                fn = jax.jit(
                    _make_unpack(spec, self.n_shards),
                    in_shardings=sh,
                    out_shardings=out_sh,
                )
            else:
                fn = jax.jit(_make_unpack(spec, 1))
            self._unpack_cache[spec] = fn
        buf = _pack_host(batch, self.n_shards)
        if self.mesh is not None:
            dbuf = jax.device_put(buf, NamedSharding(self.mesh, P("data", None)))
        else:
            dbuf = jax.device_put(buf)
        return fn(dbuf)
