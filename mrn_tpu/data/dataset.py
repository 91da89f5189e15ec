"""Dataset abstractions (reference: data/dataset.py).

Datasets yield ``(PIL.Image RGBA, label str)``; composition mirrors torch's
ConcatDataset/Subset so the reference's stream-building policies translate
one-to-one (repeat-to-50k, rehearsal subsets, the IndexConcatDataset that tags
samples with their sub-dataset index for router supervision).
"""

from __future__ import annotations

import bisect
import io
import os
import sys
from typing import List, Sequence

import numpy as np
import PIL.Image

__all__ = ["ArrayDataset", "BankDataset", "DeviceImageBank", "bank_dataset",
           "LmdbDataset", "RawDataset", "ConcatDataset", "Subset",
           "IndexConcatDataset", "hierarchical_dataset"]


class DeviceImageBank:
    """A growable device-resident uint8 image bank [N, H, W, C].

    Tasks append their decoded+resized images once (``add`` returns the
    chunk's global offset); ``as_device_array`` uploads lazily and re-uploads
    only when new chunks arrived — so an incremental run pays one transfer
    per task instead of one 33MB float32 batch per step.  Consumed by
    BaseLearner._device_images via opt.image_bank."""

    def __init__(self):
        self.chunks = []
        self.total = 0
        self._dev = None
        self.datasets = {}  # banked-view cache (root/task -> BankDataset)

    def add(self, images: np.ndarray) -> int:
        """images: [n, H, W, C] uint8. Returns the global offset."""
        assert images.dtype == np.uint8, images.dtype
        offset = self.total
        self.chunks.append(images)
        self.total += len(images)
        self._dev = None
        return offset

    def as_device_array(self):
        if self._dev is None:
            import jax
            self._dev = jax.device_put(
                self.chunks[0] if len(self.chunks) == 1
                else np.concatenate(self.chunks, axis=0))
        return self._dev


def bank_dataset(dataset, opt, bank: DeviceImageBank) -> "BankDataset":
    """Decode + resize every sample of ``dataset`` ONCE (bicubic to
    (imgW, imgH), RGBA uint8), append to the device bank, and return the
    index-yielding view.  Not compatible with per-epoch image augmentation
    (opt.Aug) — images are frozen at bank time."""
    if opt.get("Aug", "None") not in (None, "None"):
        raise ValueError("device_bank is incompatible with Aug (images are "
                         "resized+frozen once; augmentation needs per-epoch "
                         "randomness)")
    size = (opt.imgW, opt.imgH)
    images, labels = [], []
    for i in range(len(dataset)):
        img, label = dataset[i]
        if not isinstance(img, PIL.Image.Image):
            img = PIL.Image.fromarray(img).convert("RGBA")
        img = img.resize(size, PIL.Image.BICUBIC)
        images.append(np.asarray(img, dtype=np.uint8))
        labels.append(label)
    offset = bank.add(np.stack(images))
    return BankDataset(offset, labels)


class BankDataset:
    """Items are (global bank index, label): the images live in a
    device-resident uint8 bank (see SyntheticSource.device_bank) and the host
    pipeline moves only int32 indices — the HBM-resident dataset cache for
    suites that fit on chip.  Gather + normalize happen on device
    (BaseLearner._device_images), so each train step's H2D transfer is ~1KB
    of indices instead of a 33MB float32 batch."""

    def __init__(self, start: int, labels: Sequence[str]):
        self.start = start
        self.labels = labels

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx):
        return np.int32(self.start + idx), self.labels[idx]


class ArrayDataset:
    """In-memory dataset of (HxWx4 uint8 arrays or PIL images, labels)."""

    def __init__(self, images: Sequence, labels: Sequence[str]):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = self.images[idx]
        if isinstance(img, np.ndarray) and img.dtype == np.float32:
            return img, self.labels[idx]  # pre-transformed fast path
        if not isinstance(img, PIL.Image.Image):
            img = PIL.Image.fromarray(img).convert("RGBA")
        return img, self.labels[idx]


class LmdbDataset:
    """LMDB crop dataset: 'image-%09d'/'label-%09d' records, label-length
    filtering, RGBA decode, corrupted-image dummy fallback
    (reference: data/dataset.py:44-112).

    Backed by mrn_tpu.data.lmdb_store (native C++ reader for standard LMDB
    files)."""

    def __init__(self, root: str, opt, mode: str = "train"):
        from mrn_tpu.data.lmdb_store import LmdbReader

        self.root = root
        self.opt = opt
        self.mode = mode
        self.env = LmdbReader(root)
        n = int(self.env.get(b"num-samples").decode())
        self.filtered_index_list: List[int] = []
        for index in range(1, n + 1):  # lmdb keys start at 1
            label = self.env.get(b"label-%09d" % index)
            if label is None:
                continue
            if len(label.decode("utf-8")) > opt.batch_max_length:
                continue
            self.filtered_index_list.append(index)

    def __len__(self):
        return len(self.filtered_index_list)

    def __getitem__(self, idx):
        index = self.filtered_index_list[idx]
        label = self.env.get(b"label-%09d" % index).decode("utf-8")
        imgbuf = self.env.get(b"image-%09d" % index)
        try:
            img = PIL.Image.open(io.BytesIO(imgbuf)).convert("RGBA")
        except (IOError, OSError):
            img = PIL.Image.new("RGBA", (self.opt.imgW, self.opt.imgH))
            label = "[dummy_label]"
        return img, label


class RawDataset:
    """Folder of jpg/jpeg/png images; yields (image, path)
    (reference: data/dataset.py:115-142)."""

    def __init__(self, root: str, opt):
        self.opt = opt
        self.image_path_list = []
        for dirpath, _, filenames in os.walk(root):
            for name in filenames:
                if os.path.splitext(name)[1].lower() in (".jpg", ".jpeg", ".png"):
                    self.image_path_list.append(os.path.join(dirpath, name))
        self.image_path_list.sort()

    def __len__(self):
        return len(self.image_path_list)

    def __getitem__(self, idx):
        path = self.image_path_list[idx]
        try:
            img = PIL.Image.open(path).convert("RGBA")
        except (IOError, OSError):
            img = PIL.Image.new("RGBA", (self.opt.imgW, self.opt.imgH))
        return img, path


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cumulative_sizes[-1]

    def _locate(self, idx):
        if idx < 0:
            if -idx > len(self):
                raise ValueError("index out of range")
            idx = len(self) + idx
        dataset_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        sample_idx = idx if dataset_idx == 0 else idx - self.cumulative_sizes[dataset_idx - 1]
        return dataset_idx, sample_idx

    def __getitem__(self, idx):
        dataset_idx, sample_idx = self._locate(idx)
        return self.datasets[dataset_idx][sample_idx]


class IndexConcatDataset(ConcatDataset):
    """Returns ((image, label), dataset_idx) — the router supervision signal
    (reference: data/data_manage.py:272-283).  NOTE: the reference nests the
    rehearsal-memory ConcatDataset as ONE element, so dataset_idx is binary
    memory-vs-current; preserved verbatim for parity."""

    def __getitem__(self, idx):
        dataset_idx, sample_idx = self._locate(idx)
        return self.datasets[dataset_idx][sample_idx], dataset_idx


class Subset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


def hierarchical_dataset(root: str, opt, select_data="/", mode: str = "train"):
    """Walk leaf directories under root, open each as an LMDB dataset
    (reference: data/dataset.py:15-41)."""
    dataset_list = []
    dataset_log = f"dataset_root:  {root}\t dataset: {select_data}\n"
    for dirpath, dirnames, _ in os.walk(root + "/"):
        if not dirnames:
            if any(sel in dirpath for sel in select_data):
                ds = LmdbDataset(dirpath, opt, mode=mode)
                dataset_log += (f"sub-directory:\t/{os.path.relpath(dirpath, root)}"
                                f"\t num samples: {len(ds)}\n")
                dataset_list.append(ds)
    return ConcatDataset(dataset_list), dataset_log
