"""ctypes binding for the native .cfs reader (native/feature_store.cpp).

Same FeatureStore interface as PackedArrayStore plus:
  * read_batch(keys, max_rows) -> padded (N, max_rows, D) + lengths, filled
    by parallel memcpy in C++ — exactly the fixed-shape window tensors the
    device loader consumes;
  * prefetch(keys) -> background page-warming so batch fills never stall.

The shared library builds on first use (g++ is in the image); set
CONE_TPU_NO_NATIVE=1 to force the pure-Python reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "feature_store.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libconestore.so")
_lock = threading.Lock()
_lib = None


def _build_lib() -> str:
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        # serialize concurrent builders (multi-host ranks on a shared
        # filesystem, pytest workers) and publish atomically: compiling
        # straight to the final path lets a peer CDLL a half-written ELF
        import fcntl

        with open(_LIB_PATH + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-pthread", _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, _LIB_PATH)
    return _LIB_PATH


def _load_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_lib())
            lib.cfs_open.restype = ctypes.c_void_p
            lib.cfs_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.cfs_close.argtypes = [ctypes.c_void_p]
            lib.cfs_dim.restype = ctypes.c_uint32
            lib.cfs_dim.argtypes = [ctypes.c_void_p]
            lib.cfs_dtype.restype = ctypes.c_uint8
            lib.cfs_dtype.argtypes = [ctypes.c_void_p]
            lib.cfs_num_entries.restype = ctypes.c_uint64
            lib.cfs_num_entries.argtypes = [ctypes.c_void_p]
            lib.cfs_rows.restype = ctypes.c_int64
            lib.cfs_rows.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.cfs_read.restype = ctypes.c_int64
            lib.cfs_read.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.cfs_read_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.cfs_prefetch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ]
            _lib = lib
    return _lib


def native_available() -> bool:
    if os.environ.get("CONE_TPU_NO_NATIVE"):
        return False
    try:
        _load_lib()
        return True
    except Exception:
        return False


class NativePackedStore:
    """FeatureStore backed by the C++ reader. Also needs the Python-side
    index for keys() (the C side keeps its own for lookups)."""

    def __init__(self, path: str, prefetch_threads: int = 2):
        self._lib = _load_lib()
        self._h = self._lib.cfs_open(path.encode(), prefetch_threads)
        if not self._h:
            raise IOError(f"failed to open packed store: {path}")
        self.path = path
        self.dim = int(self._lib.cfs_dim(self._h))
        self.dtype = np.float32 if self._lib.cfs_dtype(self._h) == 0 else np.float16
        # keys come from the (cheap) python index parse
        from cone_tpu.data.store import PackedArrayStore

        self._keys = list(PackedArrayStore(path).keys())

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cfs_close(self._h)
            self._h = None

    def keys(self):
        return self._keys

    def __contains__(self, key: str) -> bool:
        return self._lib.cfs_rows(self._h, key.encode()) >= 0

    def get(self, key: str) -> np.ndarray:
        rows = self._lib.cfs_rows(self._h, key.encode())
        if rows < 0:
            raise KeyError(key)
        out = np.empty((rows, self.dim), self.dtype)
        got = self._lib.cfs_read(
            self._h, key.encode(), out.ctypes.data_as(ctypes.c_void_p), rows
        )
        assert got == rows
        return out

    def read_batch(self, keys, max_rows: int):
        """(N, max_rows, D) zero-padded batch + (N,) true lengths."""
        n = len(keys)
        blob = b"".join(k.encode() + b"\0" for k in keys)
        out = np.empty((n, max_rows, self.dim), self.dtype)
        lengths = (ctypes.c_int64 * n)()
        self._lib.cfs_read_batch(
            self._h, blob, n, max_rows,
            out.ctypes.data_as(ctypes.c_void_p), lengths,
        )
        return out, np.asarray(lengths, np.int64)

    def prefetch(self, keys) -> None:
        blob = b"".join(k.encode() + b"\0" for k in keys)
        self._lib.cfs_prefetch(self._h, blob, len(keys))
