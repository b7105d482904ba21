"""Native (C++) host-input-pipeline components.

``jpeg_decode.cpp`` fuses JPEG decode -> crop -> Pillow-bicubic resize ->
normalize into one GIL-free libjpeg-turbo call (DCT-scaled decode +
scanline cropping), replacing the PIL+numpy per-image chain in the host
loaders.  The reference's native analogue is torch DataLoader's C worker
machinery + PIL (reference ``data/__init__.py:93-104``); here the decode
itself is the native component, built on demand with ``g++`` (no
pre-install step — the toolchain is part of the target environment).

Opt-in: the transforms use this only under ``MADTP_NATIVE_JPEG=1``
(default remains the PIL path, which the golden preprocessing tests pin).
With DCT scaling disabled the native path is bit-exact vs PIL decode +
``Image.resize(BICUBIC)``; with scaling enabled it deviates by a few
uint8 LSB (tolerance-tested in tests/test_native_jpeg.py) for ~1.3-2x
less decode work.

API:
    available() -> bool            (builds + loads on first call)
    jpeg_dims(data) -> (w, h)
    decode_resize(data, size, crop=None, dct_scale=True) -> uint8 HWC
    decode_resize_norm(data, size, crop=None, dct_scale=True) -> fp32 CHW
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "jpeg_decode.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _stats():
    # the canonical CLIP normalization constants live in data/transforms;
    # no import cycle (transforms imports this module only inside functions)
    from madtp_tpu.data.transforms import MEAN, STD

    return (np.ascontiguousarray(MEAN, np.float32),
            np.ascontiguousarray(STD, np.float32))


def _cache_dir() -> str:
    # per-user 0700 dir: a world-writable /tmp with a predictable .so name
    # would let another local user plant a library we'd CDLL-load
    d = os.path.join(tempfile.gettempdir(), f"madtp_native_{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        raise RuntimeError(f"refusing unsafe native cache dir {d}")
    return d


def _build_and_load():
    src = open(_SRC, "rb").read()
    tag = hashlib.sha1(src).hexdigest()[:12]
    so = os.path.join(_cache_dir(), f"madtp_jpeg_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".build.{os.getpid()}"
        base = ["g++", "-O3", "-fPIC", "-shared", "-o", tmp, _SRC, "-ljpeg"]
        # the .so runs on the machine that builds it: -march=native is safe
        # and lets the resampler loops vectorize; fall back for odd compilers
        r = subprocess.run(base[:1] + ["-march=native"] + base[1:],
                           capture_output=True)
        if r.returncode != 0:
            subprocess.run(base, check=True, capture_output=True)
        os.replace(tmp, so)  # atomic vs concurrent builders
    lib = ctypes.CDLL(so)
    lib.madtp_jpeg_dims.restype = ctypes.c_int
    lib.madtp_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.madtp_decode_resize.restype = ctypes.c_int
    lib.madtp_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,          # data, len
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # crop
        ctypes.c_int, ctypes.c_int,                # out_w, out_h
        ctypes.c_int, ctypes.c_int,                # allow_dct_scale, fuse
        ctypes.c_void_p, ctypes.c_void_p,          # mean, std
        ctypes.c_void_p, ctypes.c_void_p]          # out_u8, out_f32
    lib.madtp_resize_norm.restype = ctypes.c_int
    lib.madtp_resize_norm.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,  # in, in_w, in_h
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # crop
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # out_w, out_h, fuse
        ctypes.c_void_p, ctypes.c_void_p,          # mean, std
        ctypes.c_void_p, ctypes.c_void_p]          # out_u8, out_f32
    return lib


def available() -> bool:
    """Build (once) and load the native library; False if that fails
    (missing toolchain/headers — callers fall back to PIL)."""
    global _lib, _tried
    if _lib is not None:
        return True
    if _tried:
        return False
    with _lock:
        if _lib is None and not _tried:
            try:
                _lib = _build_and_load()
            except Exception:
                _tried = True
    return _lib is not None


class UnsupportedJpeg(Exception):
    """Corrupt stream or CMYK/YCCK color space — use the PIL path."""


def jpeg_dims(data: bytes) -> Tuple[int, int]:
    if not available():
        raise UnsupportedJpeg("native helper unavailable")
    w, h = ctypes.c_int(), ctypes.c_int()
    if _lib.madtp_jpeg_dims(data, len(data), ctypes.byref(w),
                            ctypes.byref(h)):
        raise UnsupportedJpeg("header parse failed")
    return w.value, h.value


def _call(data: bytes, size, crop, dct_scale: bool, fuse: bool):
    if not available():
        raise UnsupportedJpeg("native helper unavailable")
    out_w, out_h = (size, size) if isinstance(size, int) else size
    cx, cy, cw, ch = crop if crop is not None else (0, 0, -1, -1)
    if fuse:
        out = np.empty((3, out_h, out_w), np.float32)
        u8, f32 = None, out.ctypes.data_as(ctypes.c_void_p)
    else:
        out = np.empty((out_h, out_w, 3), np.uint8)
        u8, f32 = out.ctypes.data_as(ctypes.c_void_p), None
    mean, std = _stats()
    rc = _lib.madtp_decode_resize(
        data, len(data), cx, cy, cw, ch, out_w, out_h,
        int(dct_scale), int(fuse),
        mean.ctypes.data_as(ctypes.c_void_p),
        std.ctypes.data_as(ctypes.c_void_p), u8, f32)
    if rc:
        raise UnsupportedJpeg(f"native decode rc={rc}")
    return out


def decode_resize(data: bytes, size, crop: Optional[tuple] = None,
                  dct_scale: bool = True) -> np.ndarray:
    """JPEG bytes -> uint8 HWC RGB at ``size`` (int or (w, h));
    ``crop=(x, y, w, h)`` in full-resolution pixel coordinates."""
    return _call(data, size, crop, dct_scale, fuse=False)


def decode_resize_norm(data: bytes, size, crop: Optional[tuple] = None,
                       dct_scale: bool = True) -> np.ndarray:
    """JPEG bytes -> normalized float32 CHW (the eval-transform layout)."""
    return _call(data, size, crop, dct_scale, fuse=True)


def _resize_call(arr: np.ndarray, size, crop, fuse: bool):
    if not available():
        raise UnsupportedJpeg("native helper unavailable")
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape[:2]
    out_w, out_h = (size, size) if isinstance(size, int) else size
    cx, cy, cw, ch = crop if crop is not None else (0, 0, -1, -1)
    if fuse:
        out = np.empty((3, out_h, out_w), np.float32)
        u8, f32 = None, out.ctypes.data_as(ctypes.c_void_p)
    else:
        out = np.empty((out_h, out_w, 3), np.uint8)
        u8, f32 = out.ctypes.data_as(ctypes.c_void_p), None
    mean, std = _stats()
    rc = _lib.madtp_resize_norm(
        arr.ctypes.data_as(ctypes.c_void_p), w, h, cx, cy, cw, ch,
        out_w, out_h, int(fuse),
        mean.ctypes.data_as(ctypes.c_void_p),
        std.ctypes.data_as(ctypes.c_void_p), u8, f32)
    if rc:
        raise UnsupportedJpeg(f"native resize rc={rc}")
    return out


def resize(arr: np.ndarray, size, crop: Optional[tuple] = None) -> np.ndarray:
    """uint8 HWC RGB -> uint8 HWC at ``size`` (Pillow-bicubic; optional
    crop in source pixel coords).  For already-decoded non-JPEG images."""
    return _resize_call(arr, size, crop, fuse=False)


def resize_norm(arr: np.ndarray, size, crop: Optional[tuple] = None) -> np.ndarray:
    """uint8 HWC RGB -> normalized float32 CHW (eval-transform layout)."""
    return _resize_call(arr, size, crop, fuse=True)
