"""Synthetic IMLTR-style data for tests and CPU-runnable smoke configs: word
crops whose pixel content encodes the label (per-character vertical bands with
distinct intensities), so tiny models can actually learn them — the golden
tiny-LMDB strategy from SURVEY.md §4.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from mrn_tpu.data.dataset import ArrayDataset

__all__ = ["synth_word_image", "make_task_dataset", "make_task_suite"]


def synth_word_image(word: str, alphabet: str, img_h: int = 32, img_w: int = 64,
                     rng=None) -> np.ndarray:
    """RGBA uint8 image: each character paints a vertical band whose intensity
    identifies it; light noise on top."""
    rng = rng or np.random.default_rng(0)
    img = np.zeros((img_h, img_w, 4), dtype=np.float32)
    img[..., 3] = 255.0
    n = max(1, len(word))
    band = img_w // n
    for i, ch in enumerate(word):
        k = alphabet.index(ch)
        level = 40 + (215 * (k + 1)) // (len(alphabet) + 1)
        x0, x1 = i * band, min(img_w, (i + 1) * band)
        img[:, x0:x1, 0] = level
        img[:, x0:x1, 1] = 255 - level
        img[:, x0:x1, 2] = (level * 2) % 255
    img[..., :3] += rng.normal(0, 4.0, size=img[..., :3].shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_task_dataset(alphabet: str, n_samples: int, img_h: int = 32,
                      img_w: int = 64, min_len: int = 1, max_len: int = 4,
                      seed: int = 0) -> ArrayDataset:
    rng = np.random.default_rng(seed)
    images, labels = [], []
    for _ in range(n_samples):
        length = int(rng.integers(min_len, max_len + 1))
        word = "".join(rng.choice(list(alphabet), size=length))
        images.append(synth_word_image(word, alphabet, img_h, img_w, rng))
        labels.append(word)
    return ArrayDataset(images, labels)


def make_task_suite(task_alphabets: Sequence[str], n_train: int, n_test: int,
                    img_h: int = 32, img_w: int = 64, seed: int = 0):
    """Per-task train/test ArrayDatasets + per-task dict lists (the synthetic
    MLT17-like incremental suite).  Returns (trains, tests, dicts)."""
    trains, tests, dicts = [], [], []
    for i, alphabet in enumerate(task_alphabets):
        trains.append(make_task_dataset(alphabet, n_train, img_h, img_w,
                                        seed=seed + 2 * i))
        tests.append(make_task_dataset(alphabet, n_test, img_h, img_w,
                                       seed=seed + 2 * i + 1))
        dicts.append(list(alphabet))
    return trains, tests, dicts


class SyntheticSource:
    """Dataset factories wiring the synthetic suite into DatasetManager /
    ValDataset (keyed by language name, like the reference's
    `<root>/<language>` LMDB layout)."""

    def __init__(self, task_alphabets: Sequence[str], lan_list: Sequence[str],
                 n_train: int = 64, n_test: int = 16, img_h: int = 32,
                 img_w: int = 64, seed: int = 0):
        trains, tests, dicts = make_task_suite(task_alphabets, n_train, n_test,
                                               img_h, img_w, seed)
        self.lan_list = list(lan_list)
        self.trains: Dict[str, ArrayDataset] = dict(zip(lan_list, trains))
        self.tests: Dict[str, ArrayDataset] = dict(zip(lan_list, tests))
        self.dicts: Dict[str, List[str]] = dict(zip(lan_list, dicts))

    def train_factory(self, data_root: str, taski: int, mode: str):
        return self.trains[self.lan_list[taski]]

    def val_factory(self, val_data: str):
        lan = val_data.rstrip("/").rsplit("/", 1)[-1]
        return self.tests[lan]

    def cumulative_character(self, upto_task: int) -> List[str]:
        char: Dict[str, int] = {}
        for i in range(upto_task + 1):
            for ch in self.dicts[self.lan_list[i]]:
                if ch not in char:
                    char[ch] = 1
        return list(char.keys())
