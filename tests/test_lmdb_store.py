import io
import os

import numpy as np
import PIL.Image
import pytest

from mrn_tpu.data.lmdb_store import LmdbReader, LmdbWriter


def test_roundtrip_small(tmp_path):
    path = str(tmp_path / "db")
    w = LmdbWriter(path)
    w.put(b"num-samples", b"3")
    for i in range(1, 4):
        w.put(b"label-%09d" % i, f"word{i}".encode())
        w.put(b"image-%09d" % i, bytes([i]) * 100)
    w.commit()

    r = LmdbReader(path)
    assert len(r) == 7
    assert r.get(b"num-samples") == b"3"
    assert r.get(b"label-%09d" % 2) == b"word2"
    assert r.get(b"image-%09d" % 3) == bytes([3]) * 100
    assert r.get(b"missing") is None


def test_roundtrip_overflow_values(tmp_path):
    """Values larger than half a page go to overflow pages (real JPEG blobs)."""
    path = str(tmp_path / "db")
    w = LmdbWriter(path)
    rng = np.random.default_rng(0)
    blobs = {}
    for i in range(1, 6):
        blob = rng.integers(0, 256, size=3000 + i * 4096).astype(np.uint8).tobytes()
        blobs[i] = blob
        w.put(b"image-%09d" % i, blob)
    w.commit()
    r = LmdbReader(path)
    for i, blob in blobs.items():
        assert r.get(b"image-%09d" % i) == blob


def test_roundtrip_many_keys_multilevel(tmp_path):
    """Enough keys to force branch pages (multi-level B+tree)."""
    path = str(tmp_path / "db")
    w = LmdbWriter(path)
    n = 5000
    for i in range(n):
        w.put(b"key-%09d" % i, b"v%d" % i)
    w.commit()
    r = LmdbReader(path)
    assert len(r) == n
    for i in (0, 1, 999, 2500, n - 1):
        assert r.get(b"key-%09d" % i) == b"v%d" % i


def test_lmdb_dataset_integration(tmp_path):
    """LmdbDataset reads an lmdbx-written crop dataset (image decode, label
    filter, dummy fallback)."""
    from mrn_tpu.config import default_options
    from mrn_tpu.data.dataset import LmdbDataset

    path = str(tmp_path / "db")
    w = LmdbWriter(path)
    rng = np.random.default_rng(0)
    n = 4
    w.put(b"num-samples", str(n).encode())
    for i in range(1, n + 1):
        img = PIL.Image.fromarray(
            rng.integers(0, 255, size=(20, 50, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w.put(b"image-%09d" % i, buf.getvalue())
        label = "toolongword" * 5 if i == n else f"w{i}"
        w.put(b"label-%09d" % i, label.encode())
    w.commit()

    opt = default_options(batch_max_length=8)
    ds = LmdbDataset(path, opt, mode="train")
    assert len(ds) == n - 1  # long label filtered out
    img, label = ds[0]
    assert img.mode == "RGBA"
    assert label == "w1"
