"""Pure-numpy reader for torch-format checkpoints (zip and legacy).

NeMo ``.nemo`` archives contain a ``model_weights.ckpt`` written by
``torch.save`` (see reference loader `/root/reference/src/thunder/quartznet/
compatibility.py:137-141`).  The framework reads those into numpy arrays
without requiring torch at runtime: a restricted unpickler understands the
persistent-id storage protocol and rebuilds strided tensors as numpy views.

Supports:
- the zip container (torch >= 1.6): ``<name>/data.pkl`` + ``<name>/data/<key>``
- the legacy sequential container (magic/protocol/sys_info pickles followed
  by storage payloads)

Falls back to ``torch.load`` if available and the pure reader hits an
unsupported construct.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

__all__ = ["load_torch_checkpoint"]

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially below
}


class _StorageRef:
    __slots__ = ("key", "dtype", "numel", "storage_name")

    def __init__(self, key, dtype, numel, storage_name):
        self.key, self.dtype, self.numel, self.storage_name = key, dtype, numel, storage_name


class _FakeTensor:
    """Deferred tensor: storage ref + layout, materialized once data is read."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset, self.size, self.stride = storage, offset, size, stride

    def materialize(self, raw: bytes) -> np.ndarray:
        if self.storage.storage_name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            u32 = u16.astype(np.uint32) << 16
            flat = u32.view(np.float32)
        else:
            flat = np.frombuffer(raw, dtype=self.storage.dtype)
        itemsize = flat.itemsize
        strides = tuple(s * itemsize for s in self.stride)
        return np.lib.stride_tricks.as_strided(
            flat[self.offset :], shape=tuple(self.size), strides=strides
        ).copy()


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *args):
    return _FakeTensor(storage, storage_offset, size, stride)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _FakeTensor(storage, storage_offset, size, stride)


class _Unpickler(pickle.Unpickler):
    def __init__(self, f):
        super().__init__(f, encoding="latin1")
        self.storages: Dict[str, _StorageRef] = {}

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id: {typename}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = getattr(storage_type, "__name__", str(storage_type))
        if name == "UntypedStorage" or name not in _DTYPES:
            # modern torch uses (UntypedStorage, key, location, numel) with a
            # dtype carried separately; map via the scalar type string
            name = str(storage_type)
        ref = _StorageRef(key, _DTYPES.get(name), numel, name)
        self.storages[key] = ref
        return ref

    def find_class(self, module, name):
        if name in ("_rebuild_tensor_v2",):
            return _rebuild_tensor_v2
        if name == "_rebuild_tensor":
            return _rebuild_tensor
        if name.endswith("Storage"):
            # dynamic class so __name__ reports the storage type correctly
            return type(name, (), {})
        if (module, name) == ("collections", "OrderedDict"):
            from collections import OrderedDict

            return OrderedDict
        if (module, name) == ("torch", "Size"):
            return tuple
        if name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks: data
        if module.startswith("numpy"):
            import importlib

            return getattr(importlib.import_module(module), name)
        # tolerate simple scalar holders (e.g. torch.device) by returning str
        if (module, name) == ("torch", "device"):
            return str
        raise pickle.UnpicklingError(f"blocked class during checkpoint load: {module}.{name}")


def _materialize(obj: Any, read_storage) -> Any:
    if isinstance(obj, _FakeTensor):
        return obj.materialize(read_storage(obj.storage))
    if isinstance(obj, dict):
        return {k: _materialize(v, read_storage) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        seq = [_materialize(v, read_storage) for v in obj]
        return type(obj)(seq) if isinstance(obj, tuple) else seq
    return obj


def _load_zip(path: str) -> Dict[str, np.ndarray]:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        with zf.open(pkl_name) as f:
            up = _Unpickler(io.BytesIO(f.read()))
            obj = up.load()

        def read_storage(ref: _StorageRef) -> bytes:
            return zf.read(f"{prefix}data/{ref.key}")

        return _materialize(obj, read_storage)


def _load_legacy(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != 0x1950A86A20F9469CFC6C:
            raise ValueError("not a legacy torch file")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info
        up = _Unpickler(f)
        obj = up.load()
        keys = pickle.load(f)
        data: Dict[str, bytes] = {}
        for key in keys:
            ref = up.storages[key]
            (numel,) = struct.unpack("<q", f.read(8))
            itemsize = 2 if ref.storage_name in ("HalfStorage", "BFloat16Storage") else np.dtype(ref.dtype or np.float32).itemsize
            data[key] = f.read(numel * itemsize)

        return _materialize(obj, lambda ref: data[ref.key])


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into a flat ``{key: numpy array}`` dict."""
    try:
        if zipfile.is_zipfile(path):
            obj = _load_zip(path)
        else:
            obj = _load_legacy(path)
    except Exception:
        # graceful fallback when torch is around (e.g. exotic formats)
        try:
            import torch
        except ImportError:  # pragma: no cover
            raise
        obj = torch.load(path, map_location="cpu", weights_only=False)
        obj = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in dict(obj).items()}
    if hasattr(obj, "items"):
        return dict(obj)
    raise ValueError(f"checkpoint at {path} did not contain a state dict")
