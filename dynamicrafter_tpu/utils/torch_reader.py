"""Torch-free reader for PyTorch zip-format checkpoints.

Serving a TPU pod should not require installing torch just to read the
released ``model.ckpt`` (reference load path:
scripts/evaluation/inference.py:34-59 uses ``torch.load``).  A modern
torch checkpoint is a zip archive holding ``<root>/data.pkl`` — a pickle
whose tensors are persistent-id references into ``<root>/data/<key>``
storage blobs — so it can be decoded with the stdlib ``pickle`` module
plus numpy.  This reader:

  * whitelists exactly the globals a plain state-dict needs (same spirit
    as ``torch.load(weights_only=True)``) and errors on anything else;
  * rebuilds tensors as numpy arrays (stride-aware, copied contiguous);
  * maps bfloat16 storages through ``ml_dtypes.bfloat16`` (ships with jax).

``pipeline.from_checkpoint`` uses it automatically when torch is not
importable; with torch present, torch.load remains the default (it also
covers the legacy non-zip format, which predates every DynamiCrafter
release).
"""
from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

try:  # bundled with jax
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": _BF16,
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    """torch._utils._rebuild_tensor_v2 equivalent on a numpy storage."""
    arr, itemsize = storage
    base = arr[storage_offset:]
    if not size:
        return base[:1].reshape(()).copy()
    strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(base, shape=tuple(size),
                                           strides=strides)
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _WeightsUnpickler(pickle.Unpickler):
    """weights_only-style unpickler: state-dict globals only."""

    def __init__(self, f, read_storage):
        # torch.load defaults to encoding='utf-8' for py2-era byte strings
        super().__init__(f, encoding="utf-8")
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        raise pickle.UnpicklingError(
            f"torch_reader: refusing global {module}.{name} — this reader "
            "loads plain tensor state dicts only (use torch.load for "
            "checkpoints with arbitrary pickled objects)")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        dtype = _STORAGE_DTYPES.get(storage_type.name)
        if dtype is None:
            raise pickle.UnpicklingError(
                f"unsupported storage dtype {storage_type.name} "
                "(bfloat16 needs ml_dtypes)")
        return self._read_storage(key, dtype, numel)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a zip-format torch checkpoint into a dict of numpy arrays.

    Returns the raw pickled object (typically a state dict, possibly
    wrapped under 'state_dict'/'module' — utils/weights.py
    normalize_state_dict handles the wrapping, exactly as after
    torch.load).
    """
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(
                f"{path}: not a zip-format torch checkpoint (legacy "
                "torch.save format needs torch installed)")
        root = pkl_names[0][: -len("data.pkl")]

        def read_storage(key, dtype, numel):
            raw = zf.read(f"{root}data/{key}")
            arr = np.frombuffer(raw, dtype=dtype, count=numel)
            return (arr, dtype.itemsize)

        with zf.open(pkl_names[0]) as f:
            return _WeightsUnpickler(io.BytesIO(f.read()),
                                     read_storage).load()


# ---------------------------------------------------------------------------
# torch-free WRITER (inverse: emit a zip-format checkpoint torch.load reads)
# ---------------------------------------------------------------------------

def _global(module: str, qualname: str):
    """A class object that pickles as ``module.qualname`` without importing
    it — pickle serializes classes by (module, qualname) reference only."""
    cls = type(qualname, (), {})
    cls.__module__ = module
    cls.__qualname__ = qualname
    return cls


_REBUILD_GLOBAL = _global("torch._utils", "_rebuild_tensor_v2")
_NP_TO_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}
if _BF16 is not None:
    _NP_TO_STORAGE[_BF16] = "BFloat16Storage"


class _StorageProxy:
    def __init__(self, key: str, storage_name: str, numel: int):
        self.key = key
        self.type_cls = _global("torch", storage_name)
        self.numel = numel


class _TensorProxy:
    def __init__(self, storage: _StorageProxy, shape, strides):
        self.storage = storage
        self.shape = tuple(shape)
        self.strides = tuple(strides)

    def __reduce_ex__(self, protocol):
        return (_REBUILD_GLOBAL,
                (self.storage, 0, self.shape, self.strides, False,
                 OrderedDict()))


class _WeightsPickler(pickle._Pickler):
    """Pure-python pickler that emits torch globals BY NAME.

    pickle.Pickler verifies every global by importing it and comparing
    identity — impossible for torch symbols on a torch-less host. Our
    placeholder classes carry the right (module, qualname); write the
    GLOBAL opcode directly for them. The pure-python pickler only handles
    the (small) structure pickle; tensor payloads live in the zip records.
    """

    def persistent_id(self, obj):
        if isinstance(obj, _StorageProxy):
            return ("storage", obj.type_cls, obj.key, "cpu", obj.numel)
        return None

    def save_global(self, obj, name=None):
        module = getattr(obj, "__module__", "")
        if module.startswith("torch"):
            qual = obj.__qualname__
            self.write(pickle.GLOBAL + module.encode("utf-8") + b"\n"
                       + qual.encode("utf-8") + b"\n")
            self.memoize(obj)
            return
        super().save_global(obj, name)


def save_torch_checkpoint(path: str, obj: Any) -> None:
    """Write ``obj`` (nested dicts/lists of numpy arrays + plain scalars)
    as a zip-format torch checkpoint readable by
    ``torch.load(weights_only=True)`` — no torch import required.

    Used by scripts/export_checkpoint.py on hosts without torch; the
    reference code then consumes the file unchanged.
    """
    storages = []  # (key, bytes)

    def convert(x):
        if isinstance(x, np.ndarray) or np.isscalar(x) and hasattr(x, "dtype"):
            arr = np.ascontiguousarray(x)
            if arr.dtype not in _NP_TO_STORAGE:
                raise TypeError(f"no torch storage for dtype {arr.dtype}")
            key = str(len(storages))
            storages.append((key, arr.tobytes()))
            strides = tuple(s // arr.itemsize for s in arr.strides)
            return _TensorProxy(
                _StorageProxy(key, _NP_TO_STORAGE[arr.dtype], arr.size),
                arr.shape, strides)
        if isinstance(x, dict):
            return {k: convert(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(convert(v) for v in x)
        return x  # str/int/float/None pickle natively

    payload = convert(obj)
    buf = io.BytesIO()
    _WeightsPickler(buf, protocol=2).dump(payload)

    root = "archive"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", buf.getvalue())
        zf.writestr(f"{root}/version", "3\n")
        zf.writestr(f"{root}/byteorder", "little")
        for key, raw in storages:
            zf.writestr(f"{root}/data/{key}", raw)
