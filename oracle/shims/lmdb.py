"""Read-only ``lmdb`` shim backed by mrn_tpu's native lmdbx reader.

The torch reference (data/dataset.py:51-58) needs only
``lmdb.open(root, readonly=True, ...)`` -> env.begin(write=False) -> txn.get.
This module provides exactly that surface on top of the repo's C++
LMDB-format reader (native/lmdbx), so the unmodified reference code can read
the LMDBs our tools write — without the real ``lmdb`` wheel.
"""

import sys as _sys

_REPO = __file__.rsplit("/oracle/", 1)[0]
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

from mrn_tpu.data.lmdb_store import LmdbReader as _Reader  # noqa: E402


class _Txn:
    def __init__(self, reader):
        self._reader = reader

    def get(self, key):
        return self._reader.get(bytes(key))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Environment:
    def __init__(self, path):
        self._reader = _Reader(path)

    def begin(self, write=False):
        assert not write, "shim is read-only"
        return _Txn(self._reader)

    def close(self):
        self._reader.close()


def open(path, **kwargs):  # noqa: A001 - mirrors lmdb.open
    return Environment(path)
