"""Native (C++) host components, loaded via ctypes.

- dataloader: multithreaded prefetching PNG decoder (see dataloader.cpp).
  Builds on first import with g++ if the shared library is missing; falls
  back cleanly (importers should catch NativeUnavailable) so the pure-Python
  PIL path keeps working on systems without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libokvis_dataloader.so")


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    src = os.path.join(_DIR, "dataloader.cpp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
        "-lpng", "-lpthread", "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        detail = getattr(e, "stderr", b"")
        raise NativeUnavailable(f"native build failed: {detail!r}") from e


_lib: Optional[ctypes.CDLL] = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_DIR, "dataloader.cpp")
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_png_gray.restype = ctypes.c_int
    lib.decode_png_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int
    ]
    _lib = lib
    return lib


def decode_png_gray(path: str, height: int, width: int) -> np.ndarray:
    """Single-image decode (float32 grayscale)."""
    lib = get_lib()
    out = np.empty((height, width), np.float32)
    rc = lib.decode_png_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width,
    )
    if rc != 0:
        raise IOError(f"PNG decode failed ({rc}): {path}")
    return out


class PrefetchingImageLoader:
    """Ordered prefetching decoder over a list of PNG paths.

    Iterate to receive (index, image) in order; decoding runs ahead on
    n_threads worker threads."""

    def __init__(self, paths: List[str], height: int, width: int,
                 n_threads: int = 4, prefetch: int = 8):
        self._lib = get_lib()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h, self._w = height, width
        self._n = len(paths)
        self._handle = self._lib.loader_create(
            arr, len(self._paths), n_threads, height, width, prefetch
        )
        self._consumed = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._consumed >= self._n or self._handle is None:
            raise StopIteration
        out = np.empty((self._h, self._w), np.float32)
        rc = self._lib.loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        self._consumed += 1
        if rc == -1:
            raise StopIteration
        if rc == -2:
            return self.__next__()  # skip undecodable image
        return rc, out

    def close(self):
        if self._handle is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
