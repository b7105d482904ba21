"""Torch ``.pth`` checkpoint reader -> numpy dict.

The reference saves ``{'model': state_dict, 'epoch': int, 'temperature':
float}`` (reference ``compress_nlvr_dtp.py:229-236``); the scalar
``temperature`` is load-bearing at eval time (``:157``).

Primary path uses torch (CPU build is available in this environment); a pure
zipfile+pickle fallback handles environments without torch.  Tensors are
returned as numpy with original dtypes (CLIP checkpoints store fp16,
reference ``clip/model.py:654-675``) — callers upcast as the reference does
at load (``clip/clip.py:148``).
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any, Dict, Tuple

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially
    "DoubleStorage": np.float64,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _load_with_torch(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def _to_numpy(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        t = obj.detach().cpu()
        if t.dtype == torch.bfloat16:
            return t.float().numpy().astype(np.float32)
        return t.numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


class _TensorStub:
    def __init__(self, storage_key, dtype, numel):
        self.storage_key = storage_key
        self.dtype = dtype
        self.numel = numel
        self.shape = None
        self.stride = None
        self.offset = 0


def _load_pure_python(path: str) -> Dict[str, Any]:
    """Minimal torch-zip unpickler (no torch dependency): resolves
    ``persistent_id`` storage references against the zip's ``data/`` records
    and materializes strided ndarrays."""
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    prefix = names[0].split("/")[0]
    storages: Dict[str, _TensorStub] = {}

    class U(pickle.Unpickler):
        def persistent_load(self, pid):
            # ('storage', StorageType, key, location, numel)
            _, storage_type, key, _loc, numel = pid
            tname = getattr(storage_type, "__name__", str(storage_type))
            stub = _TensorStub(key, _DTYPES.get(tname, np.float32), numel)
            storages[key] = stub
            return stub

        def find_class(self, module, name):
            if module == "torch._utils" and name == "_rebuild_tensor_v2":
                return _rebuild
            if module == "torch" and name.endswith("Storage"):
                return type(name, (), {"__name__": name})
            if module == "collections" and name == "OrderedDict":
                return dict
            # anything else (e.g. argparse.Namespace in configs) -> dummy
            return type(name, (), {})

    def _rebuild(storage, offset, size, stride, *args):
        stub = storage
        arr_info = (stub, offset, tuple(size), tuple(stride))
        return arr_info

    with zf.open(f"{prefix}/data.pkl") as f:
        obj = U(f).load()

    cache: Dict[str, np.ndarray] = {}

    def materialize(v):
        if isinstance(v, tuple) and len(v) == 4 and isinstance(v[0], _TensorStub):
            stub, offset, shape, stride = v
            if stub.storage_key not in cache:
                raw = zf.read(f"{prefix}/data/{stub.storage_key}")
                cache[stub.storage_key] = np.frombuffer(raw, dtype=stub.dtype)
            flat = cache[stub.storage_key]
            itemsize = flat.dtype.itemsize
            return np.lib.stride_tricks.as_strided(
                flat[offset:], shape=shape,
                strides=tuple(s * itemsize for s in stride),
            ).copy()
        if isinstance(v, dict):
            return {k: materialize(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return type(v)(materialize(x) for x in v)
        return v

    return materialize(obj)


def load_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Returns ``(state_dict as numpy, extras)`` where extras carries
    ``temperature``/``epoch`` when present (reference eval reads temperature,
    ``compress_nlvr_dtp.py:155-157``)."""
    try:
        obj = _to_numpy(_load_with_torch(path))
    except ImportError:
        obj = _load_pure_python(path)

    if isinstance(obj, dict) and "model" in obj:
        sd = obj["model"]
        extras = {k: v for k, v in obj.items() if k != "model"}
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
        extras = {k: v for k, v in obj.items() if k != "state_dict"}
    else:
        sd, extras = obj, {}
    sd = {k: np.asarray(v) for k, v in sd.items() if isinstance(v, np.ndarray)
          or hasattr(v, "shape")}
    return sd, extras
