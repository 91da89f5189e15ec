"""Python binding for the native LMDB store (native/lmdbx/lmdbx.cpp).

The C++ core implements the standard LMDB on-disk format (reader +
bulk-writer), so datasets written by liblmdb tooling (e.g. the reference's
tools/create_lmdb_dataset.py) are readable and datasets written here are
standard LMDB files.  Bound via ctypes; the shared library is compiled once
on demand with g++ and cached under native/build/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

__all__ = ["LmdbReader", "LmdbWriter", "lib_path"]

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "lmdbx", "lmdbx.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "liblmdbx.so")
_lock = threading.Lock()
_lib = None


def lib_path() -> str:
    return _LIB


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.lmdbx_open.restype = ctypes.c_void_p
        lib.lmdbx_open.argtypes = [ctypes.c_char_p]
        lib.lmdbx_entries.restype = ctypes.c_long
        lib.lmdbx_entries.argtypes = [ctypes.c_void_p]
        lib.lmdbx_get.restype = ctypes.c_int
        lib.lmdbx_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.lmdbx_close.argtypes = [ctypes.c_void_p]
        lib.lmdbx_writer_new.restype = ctypes.c_void_p
        lib.lmdbx_writer_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.lmdbx_writer_write.restype = ctypes.c_int
        lib.lmdbx_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                           ctypes.c_uint64]
        lib.lmdbx_writer_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class LmdbReader:
    """Read-only LMDB environment (get-by-key over the main database)."""

    def __init__(self, path: str):
        self._lib = _load()
        self._env = self._lib.lmdbx_open(path.encode())
        if not self._env:
            raise IOError(f"cannot open lmdb at {path}")

    def __len__(self) -> int:
        return self._lib.lmdbx_entries(self._env)

    def get(self, key: bytes) -> Optional[bytes]:
        val = ctypes.POINTER(ctypes.c_uint8)()
        vlen = ctypes.c_size_t()
        rc = self._lib.lmdbx_get(self._env, key, len(key),
                                 ctypes.byref(val), ctypes.byref(vlen))
        if rc != 0:
            return None
        return ctypes.string_at(val, vlen.value)

    def close(self):
        if self._env:
            self._lib.lmdbx_close(self._env)
            self._env = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class LmdbWriter:
    """Bulk LMDB writer: accumulate puts, then write() a complete standard
    LMDB file (the dataset-builder write pattern, with a `put` API shaped like
    the reference's txn.put loop, create_lmdb_dataset.py:64-174)."""

    def __init__(self, path: str, map_size: int = 1 << 30):
        self._lib = _load()
        self._w = self._lib.lmdbx_writer_new()
        self.path = path
        self.map_size = map_size
        os.makedirs(path, exist_ok=True)

    def put(self, key: bytes, value: bytes):
        self._lib.lmdbx_writer_put(self._w, key, len(key), value, len(value))

    def write_batch(self, cache: dict):
        """Reference writeCache-style dict commit."""
        for k, v in cache.items():
            if isinstance(k, str):
                k = k.encode()
            if isinstance(v, str):
                v = v.encode()
            self.put(k, v)

    def commit(self) -> None:
        rc = self._lib.lmdbx_writer_write(self._w, self.path.encode(),
                                          self.map_size)
        if rc != 0:
            raise IOError(f"lmdbx write failed: {rc}")

    def close(self):
        if self._w:
            self._lib.lmdbx_writer_free(self._w)
            self._w = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
