"""Background-thread batch prefetching: overlaps host-side work (LMDB reads,
PIL decode/resize, label encoding) with device compute — the TPU-native
replacement for the reference's DataLoader worker processes
(data_manage.py num_workers=4)."""

from __future__ import annotations

import queue
import threading
from typing import Callable

__all__ = ["Prefetcher"]


class Prefetcher:
    """Wraps a ``get_batch``-style callable; a daemon thread keeps up to
    ``depth`` batches ready."""

    def __init__(self, get_batch: Callable, depth: int = 2):
        self._get_batch = get_batch
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._get_batch()
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surface on next __call__
            self._exc = e

    def __call__(self):
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self._queue.get(timeout=0.5)
            except queue.Empty:
                if not self._thread.is_alive() and self._exc is None:
                    raise RuntimeError("prefetch thread died")

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
