"""ctypes bridge to the native host runtime (native/hesaff_io.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source) and exposes decode/read/write; every entry point has a pure
Python fallback (sift_io) so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRCS = [os.path.join(_ROOT, "native", f)
         for f in ("hesaff_io.cpp", "hesaff_jpeg.cpp",
                   "hesaff_loader.cpp")]
_LIB = os.path.join(_ROOT, "native", "libhesaff_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            src_mtime = max(os.path.getmtime(s) for s in _SRCS)
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < src_mtime):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                     *_SRCS, "-o", _LIB, "-lz"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            # binding inside the guard: a stale .so missing newer
            # symbols must fall back to pure Python, not raise
            _bind(lib)
        except Exception:
            return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    lib.hesaff_decode_pnm_gray.restype = ctypes.c_int
    lib.hesaff_decode_pnm_gray.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.hesaff_decode_png_gray.restype = ctypes.c_int
    lib.hesaff_decode_png_gray.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.hesaff_decode_jpeg_gray.restype = ctypes.c_int
    lib.hesaff_decode_jpeg_gray.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.hesaff_jpeg_dims.restype = ctypes.c_int
    lib.hesaff_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.hesaff_write_sift.restype = ctypes.c_int
    lib.hesaff_write_sift.argtypes = [ctypes.c_char_p, ctypes.c_int64] + [
        ctypes.POINTER(ctypes.c_double)
    ] * 5 + [ctypes.POINTER(ctypes.c_uint8)]
    lib.hesaff_read_sift.restype = ctypes.c_int64
    lib.hesaff_read_sift.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.hesaff_loader_create.restype = ctypes.c_void_p
    lib.hesaff_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.hesaff_loader_next.restype = ctypes.c_int
    lib.hesaff_loader_next.argtypes = [
        ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int32)] * 4
    lib.hesaff_loader_fetch.restype = ctypes.c_int
    lib.hesaff_loader_fetch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.hesaff_loader_destroy.restype = None
    lib.hesaff_loader_destroy.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def decode_png_gray(data: bytes):
    """8-bit non-interlaced PNG bytes -> (H, W) float32 gray with
    equal-weight (R+G+B)/3, or None (unsupported variant / no lib)."""
    lib = _load()
    if lib is None or len(data) < 33:
        return None
    import struct

    w0, h0 = struct.unpack(">II", data[16:24])
    if w0 == 0 or h0 == 0 or w0 * h0 > (1 << 31):
        return None
    out = np.empty(w0 * h0, np.float32)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.hesaff_decode_png_gray(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w0 * h0,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return out[: w.value * h.value].reshape(h.value, w.value)


def decode_jpeg_gray(data: bytes):
    """Baseline JPEG bytes -> (H, W) float32 gray with equal-weight
    (R+G+B)/3, or None (progressive/CMYK/12-bit or no lib — callers
    fall back to PIL)."""
    lib = _load()
    if lib is None or len(data) < 4:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.hesaff_jpeg_dims(data, len(data), ctypes.byref(w),
                            ctypes.byref(h)) != 0:
        return None
    npix = int(w.value) * int(h.value)
    if npix <= 0 or npix > (1 << 27):
        return None
    out = np.empty(npix, np.float32)
    rc = lib.hesaff_decode_jpeg_gray(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), npix,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return out.reshape(h.value, w.value)


def decode_pnm_gray(data: bytes):
    """P6/P5 bytes -> (H, W) float32 gray with (R+G+B)/3, or None."""
    lib = _load()
    if lib is None:
        return None
    # header peek for size bound
    max_pixels = len(data)  # 3 bytes/px for P6 means this always bounds
    out = np.empty(max_pixels, np.float32)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.hesaff_decode_pnm_gray(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_pixels,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


def write_sift(path: str, u, v, e00, e01, e11, desc) -> bool:
    lib = _load()
    if lib is None:
        return False
    n = len(u)
    arrs = [np.ascontiguousarray(a, np.float64) for a in (u, v, e00, e01, e11)]
    d = np.ascontiguousarray(desc, np.uint8)
    rc = lib.hesaff_write_sift(
        path.encode(), n,
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrs],
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return rc == 0


def read_sift(path: str):
    lib = _load()
    if lib is None:
        return None
    n = lib.hesaff_read_sift(path.encode(), None, None, 0)
    if n < 0:
        return None
    geom = np.empty((n, 5), np.float64)
    desc = np.empty((n, 128), np.uint8)
    got = lib.hesaff_read_sift(
        path.encode(),
        geom.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
    )
    if got != n:
        return None
    return {
        "u": geom[:, 0], "v": geom[:, 1],
        "e00": geom[:, 2], "e01": geom[:, 3], "e11": geom[:, 4],
        "desc": desc,
    }


class PrefetchLoader:
    """Native threaded prefetching image loader (hesaff_loader.cpp).

    Iterates (path, padded_image_or_None, (orig_h, orig_w)) strictly in
    input order while a C++ thread pool reads, decodes, and edge-pads
    the following images in the background (decode overlaps device
    compute — ctypes releases the GIL for the blocking next() call).
    Images the native decoders cannot handle (e.g. JPEG) yield None and
    the caller falls back to its Python loader.  Use as a context
    manager or call close().
    """

    def __init__(self, paths, threads: int = 4, pad_multiple: int = 64,
                 queue_cap: int = 16):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._paths = list(paths)
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths])
        self._handle = lib.hesaff_loader_create(
            arr, len(self._paths), threads, pad_multiple, queue_cap)
        if not self._handle:
            raise RuntimeError("hesaff_loader_create failed")
        self._pos = 0

    @property
    def pos(self) -> int:
        """Index of the next path the iterator will deliver."""
        return self._pos

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is None or self._pos >= len(self._paths):
            raise StopIteration
        wp = ctypes.c_int32()
        hp = ctypes.c_int32()
        ow = ctypes.c_int32()
        oh = ctypes.c_int32()
        rc = self._lib.hesaff_loader_next(
            self._handle, ctypes.byref(wp), ctypes.byref(hp),
            ctypes.byref(ow), ctypes.byref(oh))
        if rc < 0:
            raise StopIteration
        path = self._paths[self._pos]
        self._pos += 1
        if rc != 0:
            self._lib.hesaff_loader_fetch(self._handle, None)
            return path, None, None
        img = np.empty((hp.value, wp.value), np.float32)
        self._lib.hesaff_loader_fetch(
            self._handle, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return path, img, (oh.value, ow.value)

    def close(self):
        if self._handle is not None:
            self._lib.hesaff_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort; close() is the real contract
        try:
            self.close()
        except Exception:
            pass
