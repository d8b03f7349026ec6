"""Torch-free reader for PyTorch ``.pt``/``.pth`` checkpoints (stdlib only).

The reference's warm-start recipe loads torch checkpoints at model build
(/root/reference/src/main_model.py:21-26 timm backbone; :399-603 YOLO head
tensors). This module makes that path executable without torch: a modern
``torch.save`` file is a zip archive containing

    <name>/data.pkl     pickle of the object; tensors are persistent-id
                        references ('storage', StorageType, key, device, numel)
                        rebuilt via torch._utils._rebuild_tensor_v2
    <name>/data/<key>   raw little-endian storage bytes

We unpickle with a restricted ``pickle.Unpickler``: storage references
resolve to numpy arrays read straight from the zip, the tensor-rebuild
functions are reimplemented with ``np.lib.stride_tricks.as_strided``, and
any unknown global resolves to an inert ``_Opaque`` placeholder so that
full-model checkpoints (e.g. ultralytics pickles of ``YOLO().model``) still
yield their tensor leaves without importing the original classes. Only
plain data is ever executed — ``_Opaque`` ignores all construction and
``__setstate__`` payloads except plain dicts, which it keeps so nested
state can still be walked.

Legacy (pre-1.6, non-zip) torch files are not supported; re-save with a
modern torch or export .safetensors.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

# torch storage-class name -> (numpy dtype, element size). bfloat16 uses
# ml_dtypes (shipped with jax) so converted trees stay lossless.
_STORAGE_DTYPES: Dict[str, Any] = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _bfloat16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageRef:
    """A typed view over one zip storage entry."""

    __slots__ = ("dtype", "key", "numel")

    def __init__(self, dtype, key: str, numel: int):
        self.dtype, self.key, self.numel = dtype, key, numel


class _Opaque:
    """Inert stand-in type for any class we don't know (returned as the
    CLASS from find_class so pickle's NEWOBJ/REDUCE opcodes work). Keeps
    plain-dict state so tensor leaves inside unknown objects stay
    reachable."""

    def __new__(cls, *args, **kwargs):
        return object.__new__(cls)

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):  # classmethod-style constructors
        return _Opaque()

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(
                {k: v for k, v in state.items() if not k.startswith("__")}
            )
        elif isinstance(state, tuple):
            for part in state:
                self.__setstate__(part)

    def __repr__(self):
        return f"_Opaque({', '.join(sorted(self.__dict__))})"


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    arr: np.ndarray = storage
    itemsize = arr.dtype.itemsize
    flat = arr.reshape(-1)[storage_offset:]
    return np.lib.stride_tricks.as_strided(
        flat,
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    ).copy()


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix
        self._storage_cache: Dict[str, np.ndarray] = {}

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name in ("_rebuild_parameter", "_rebuild_parameter_with_state"):
                return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module == "torch" and name == "BFloat16Storage":
            return _bfloat16()
        if module == "torch.storage" and name == "_load_from_bytes":
            raise ValueError(
                "legacy (pre-1.6) torch serialization inside this file is "
                "not supported; re-save with a modern torch"
            )
        if module == "torch" and name in ("device", "Size"):
            return _Opaque
        # anything else (nn.Module subclasses, ultralytics classes, numpy
        # scalar reconstructors in metadata, ...) becomes inert
        return _Opaque

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage", f"unknown persistent id {pid!r}"
        if key in self._storage_cache:
            return self._storage_cache[key]
        opaque = storage_type is _Opaque or isinstance(storage_type, _Opaque)
        dtype = np.dtype(np.uint8) if opaque else np.dtype(storage_type)
        raw = self._zf.read(f"{self._prefix}data/{key}")
        arr = np.frombuffer(raw, dtype=dtype, count=numel).copy()
        self._storage_cache[key] = arr
        return arr


def load_pt(path) -> Any:
    """Parse a zip-format torch checkpoint into plain python/numpy objects.

    Tensors -> np.ndarray; OrderedDict -> dict; unknown classes -> _Opaque
    placeholders whose __dict__ holds whatever plain state they carried."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(
                f"{path}: no data.pkl — not a zip-format torch checkpoint "
                "(legacy pre-1.6 files are unsupported; re-save or use "
                ".safetensors)"
            )
        pkl = min(pkl_names, key=len)
        prefix = pkl[: -len("data.pkl")]
        up = _TorchUnpickler(io.BytesIO(zf.read(pkl)), zf, prefix)
        return up.load()


def flatten_tensors(obj, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk dicts/lists/_Opaque state collecting ndarray leaves under
    dotted torch-style names."""
    out: Dict[str, np.ndarray] = {}

    def rec(o, pfx):
        if isinstance(o, np.ndarray):
            if pfx:
                out[pfx] = o
            return
        if isinstance(o, dict):
            items = o.items()
        elif isinstance(o, (list, tuple)):
            items = ((str(i), v) for i, v in enumerate(o))
        elif isinstance(o, _Opaque):
            items = o.__dict__.items()
        else:
            return
        for k, v in items:
            if k == "_args":
                continue
            rec(v, f"{pfx}.{k}" if pfx else str(k))

    rec(obj, prefix)
    return out


def load_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a .pt as a flat {name: ndarray} state_dict. Handles the common
    wrappers: a raw state_dict, {'state_dict': ...}, {'model': <module>}
    (ultralytics), or a pickled module object (tensors found via its
    recursive plain-dict state)."""
    obj = load_pt(path)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "ema"):
            inner = obj.get(key)
            if isinstance(inner, (dict, _Opaque)) and flatten_tensors(inner):
                obj = inner
                break
    flat = flatten_tensors(obj)
    # strip torch module internals: _parameters/_buffers/_modules path parts
    cleaned = {}
    for k, v in flat.items():
        parts = [p for p in k.split(".")
                 if p not in ("_parameters", "_buffers", "_modules")]
        cleaned[".".join(parts)] = v
    return cleaned
