"""First-party native (C++) host kernels.

``decode_image`` decodes JPEG/PNG bytes (optionally fused with a bilinear
resize) through ``io_kernels.cpp`` — a GIL-free C ABI, so DataLoader worker
threads decode truly in parallel (the cv2 path the reference uses holds the
GIL around parts of imread; SURVEY.md §2.9 OpenCV row).

All entry points degrade gracefully: when the toolchain or libjpeg/libpng
are unavailable the module reports ``available() == False`` and callers fall
back to cv2/PIL.
"""
from __future__ import annotations

import ctypes
import threading
from typing import Optional, Tuple

import numpy as np

from torchok_tpu.native.build import build_io_library

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        path = build_io_library()
        if path is None:
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            _load_failed = True
            return None
        lib.tkio_probe.restype = ctypes.c_int
        lib.tkio_probe.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        for fn in (lib.tkio_jpeg_info, lib.tkio_png_info):
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int)]
        lib.tkio_decode.restype = ctypes.c_int
        lib.tkio_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_void_p,
                                    ctypes.c_int, ctypes.c_int]
        for fn in (lib.tkio_jpeg_decode, lib.tkio_png_decode):
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
                           ctypes.c_int, ctypes.c_int]
        lib.tkio_resize_bilinear_u8.restype = None
        lib.tkio_resize_bilinear_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(data: bytes) -> int:
    """1 = JPEG, 2 = PNG, 0 = unsupported."""
    lib = _load()
    if lib is None:
        return 0
    return lib.tkio_probe(data, len(data))


def _info(lib, data: bytes, kind: int) -> Optional[Tuple[int, int, int]]:
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    fn = lib.tkio_jpeg_info if kind == 1 else lib.tkio_png_info
    if fn(data, len(data), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        return None
    return (h.value, w.value, c.value)


def image_info(data: bytes) -> Optional[Tuple[int, int, int]]:
    """(height, width, decoded_channels) without decoding pixels."""
    lib = _load()
    if lib is None:
        return None
    kind = lib.tkio_probe(data, len(data))
    if kind == 0:
        return None
    return _info(lib, data, kind)


def decode_image(data: bytes,
                 resize: Optional[Tuple[int, int]] = None) -> Optional[np.ndarray]:
    """Decode JPEG (-> RGB) or PNG (-> RGBA) bytes; optionally fuse a
    bilinear resize to ``(height, width)``. Returns None when the format is
    unsupported or the library is unavailable — callers fall back."""
    lib = _load()
    if lib is None:
        return None
    kind = lib.tkio_probe(data, len(data))
    if kind == 0:
        return None
    info = _info(lib, data, kind)  # one Python-side header parse
    if info is None:
        return None
    h, w, c = info
    if resize is not None and tuple(resize) == (h, w):
        resize = None
    out_h, out_w = resize if resize is not None else (h, w)
    if resize is None:
        # natural size: skip tkio_decode's internal re-parse, decode directly
        out = np.empty((h, w, c), np.uint8)
        fn = lib.tkio_jpeg_decode if kind == 1 else lib.tkio_png_decode
        rc = fn(data, len(data), out.ctypes.data_as(ctypes.c_void_p), h, w)
        return out if rc == 0 else None
    out = np.empty((out_h, out_w, c), np.uint8)
    rc = lib.tkio_decode(data, len(data), kind,
                         out.ctypes.data_as(ctypes.c_void_p), out_h, out_w)
    if rc != 0:
        return None
    return out


def decode_file(path: str,
                resize: Optional[Tuple[int, int]] = None) -> Optional[np.ndarray]:
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_image(data, resize)
