"""Synthetic IMLTR-style data for tests and CPU-runnable smoke configs: word
crops whose pixel content encodes the label (per-character vertical bands with
distinct intensities), so tiny models can actually learn them — the golden
tiny-LMDB strategy from SURVEY.md §4.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from mrn_tpu.data.dataset import ArrayDataset

__all__ = ["synth_word_image", "synth_word_image_bits", "alphabet_of_size",
           "make_task_dataset", "make_task_suite"]


def alphabet_of_size(n: int, start: int = 0x4E00) -> str:
    """n distinct characters from a contiguous BMP span (default: CJK Unified
    Ideographs, 20k+ codepoints) — for MLT-scale synthetic alphabets."""
    return "".join(chr(start + i) for i in range(n))


def synth_word_image_bits(word: str, char_to_idx: Dict[str, int],
                          img_h: int = 32, img_w: int = 256, rng=None,
                          grid: Tuple[int, int] = (4, 4)) -> np.ndarray:
    """RGBA uint8 crop for LARGE alphabets: each character's band carries a
    (grid_h x grid_w) block pattern encoding its index in binary (4x4 = 16
    bits = 65k classes).  The per-band-intensity encoder (synth_word_image)
    saturates around ~50 classes; block patterns stay conv-learnable at
    MLT-scale class counts (README.md:100: up to 1895 classes/task), and the
    code is systematic, so few samples per class suffice — like glyph
    structure does for real scripts."""
    rng = rng or np.random.default_rng(0)
    gh, gw = grid
    img = np.zeros((img_h, img_w, 4), dtype=np.float32)
    img[..., 3] = 255.0
    n = max(1, len(word))
    band = img_w // n
    for i, ch in enumerate(word):
        k = char_to_idx[ch]
        x_base = i * band
        for r in range(gh):
            y0 = r * img_h // gh
            y1 = (r + 1) * img_h // gh
            for c in range(gw):
                bit = (k >> (r * gw + c)) & 1
                x0 = x_base + c * band // gw
                x1 = x_base + (c + 1) * band // gw
                level = 225.0 if bit else 30.0
                img[y0:y1, x0:x1, 0] = level
                img[y0:y1, x0:x1, 1] = 255.0 - level
        # coarse class hint on the blue channel (redundancy)
        img[:, x_base:x_base + band, 2] = 40 + (k % 199)
    img[..., :3] += rng.normal(0, 6.0, size=img[..., :3].shape)
    return np.clip(img, 0, 255).astype(np.uint8)


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
                      seed: int = 0, renderer: str = "bands",
                      pretransformed: bool = False,
                      char_to_idx: Dict[str, int] = None,
                      zipf: float = 0.0) -> ArrayDataset:
    """renderer="bands" (intensity code, small alphabets) or "bits" (block
    pattern, MLT-scale alphabets).  pretransformed=True stores normalized
    float32 arrays that skip the per-batch PIL resize path entirely (the
    in-memory fast feed for single-core hosts).  ``char_to_idx`` overrides the
    bit-pattern index mapping — pass a GLOBAL (cross-task) mapping so task
    identity stays readable from the rendering (make_task_suite does).

    ``zipf`` > 0 draws characters from a Zipf(s=zipf) distribution over the
    alphabet (rank = alphabet order) and biases word lengths short
    (p(L) ~ 1/L) — matching real scene text, where frequent characters
    dominate both train and test and words skew short; with uniform sampling
    a 1895-class task (MLT17 Chinese, README.md:100) is unlearnable at the
    reference's instance counts, while real MLT is not."""
    rng = np.random.default_rng(seed)
    if char_to_idx is None:
        char_to_idx = {ch: i for i, ch in enumerate(alphabet)}
    chars = list(alphabet)
    char_p = None
    len_p = None
    if zipf > 0:
        char_p = 1.0 / np.arange(1, len(chars) + 1) ** zipf
        char_p /= char_p.sum()
        len_p = 1.0 / np.arange(min_len, max_len + 1)
        len_p /= len_p.sum()
    images, labels = [], []
    for _ in range(n_samples):
        if len_p is not None:
            length = int(rng.choice(np.arange(min_len, max_len + 1), p=len_p))
        else:
            length = int(rng.integers(min_len, max_len + 1))
        word = "".join(rng.choice(chars, size=length, p=char_p))
        if renderer == "bits":
            img = synth_word_image_bits(word, char_to_idx, img_h, img_w, rng)
        else:
            img = synth_word_image(word, alphabet, img_h, img_w, rng)
        if pretransformed:
            img = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
        images.append(img)
        labels.append(word)
    return ArrayDataset(images, labels)


def make_task_suite(task_alphabets: Sequence[str], n_train, n_test,
                    img_h: int = 32, img_w: int = 64, seed: int = 0,
                    min_len: int = 1, max_len: int = 4,
                    renderer: str = "bands", pretransformed: bool = False,
                    zipf: float = 0.0, shared_alphabet: str = ""):
    """Per-task train/test ArrayDatasets + per-task dict lists (the synthetic
    MLT17-like incremental suite).  ``n_train``/``n_test`` may be ints or
    per-task sequences (to echo MLT's skewed per-task instance counts).

    ``shared_alphabet``: characters prepended to EVERY task's alphabet —
    the digits/punctuation slice real MLT scripts share (reference
    README.md:94-103: Latin digits appear in all six language tasks).  With
    zipf > 0 the shared slice occupies the top frequency ranks, so shared
    glyphs dominate words exactly like digits/punctuation do in scene text.
    Cross-task glyph overlap is what makes regularization-based retention
    (EWC/LwF) measurable: on fully disjoint alphabets there is nothing for a
    penalty on old parameters to preserve (VERDICT r2 #4).
    Returns (trains, tests, dicts)."""
    if shared_alphabet:
        task_alphabets = [shared_alphabet + a for a in task_alphabets]
    trains, tests, dicts = [], [], []
    # global cross-task index mapping for the bit renderer: task identity is
    # readable from the bit pattern (disjoint index ranges per task)
    global_map = {}
    for alphabet in task_alphabets:
        for ch in alphabet:
            global_map.setdefault(ch, len(global_map))
    for i, alphabet in enumerate(task_alphabets):
        nt = n_train[i] if isinstance(n_train, (list, tuple)) else n_train
        nv = n_test[i] if isinstance(n_test, (list, tuple)) else n_test
        kw = dict(img_h=img_h, img_w=img_w, min_len=min_len, max_len=max_len,
                  renderer=renderer, pretransformed=pretransformed, zipf=zipf,
                  char_to_idx=global_map if renderer == "bits" else None)
        trains.append(make_task_dataset(alphabet, nt, seed=seed + 2 * i, **kw))
        tests.append(make_task_dataset(alphabet, nv, seed=seed + 2 * i + 1,
                                       **kw))
        dicts.append(list(alphabet))
    return trains, tests, dicts


class SyntheticSource:
    """Dataset factories wiring the synthetic suite into DatasetManager /
    ValDataset (keyed by language name, like the reference's
    `<root>/<language>` LMDB layout)."""

    def __init__(self, task_alphabets: Sequence[str], lan_list: Sequence[str],
                 n_train=64, n_test=16, img_h: int = 32,
                 img_w: int = 64, seed: int = 0, device_bank: bool = False,
                 **suite_kw):
        if device_bank:
            # the bank stores raw uint8 renders; normalization happens on
            # device (BaseLearner._device_images)
            suite_kw = dict(suite_kw, pretransformed=False)
        trains, tests, dicts = make_task_suite(task_alphabets, n_train, n_test,
                                               img_h, img_w, seed, **suite_kw)
        self.lan_list = list(lan_list)
        self.bank = None
        self._bank_dev = None
        if device_bank:
            from mrn_tpu.data.dataset import BankDataset
            chunks, offset = [], 0
            for store in (trains, tests):
                for i, ds in enumerate(store):
                    chunks.append(np.stack(ds.images))
                    store[i] = BankDataset(offset, ds.labels)
                    offset += len(ds.labels)
            self.bank = np.concatenate(chunks, axis=0)
        self.trains: Dict[str, ArrayDataset] = dict(zip(lan_list, trains))
        self.tests: Dict[str, ArrayDataset] = dict(zip(lan_list, tests))
        self.dicts: Dict[str, List[str]] = dict(zip(lan_list, dicts))

    def save(self, path: str):
        """Persist a bank-mode suite (uint8 bank + per-split labels) so
        multi-run campaigns render once."""
        assert self.bank is not None, "save() requires device_bank mode"
        payload = {"bank": self.bank}
        for split, store in (("train", self.trains), ("test", self.tests)):
            for lan, ds in store.items():
                payload[f"{split}_{lan}_start"] = np.int64(ds.start)
                payload[f"{split}_{lan}_labels"] = np.array(ds.labels)
        np.savez(path if path.endswith(".npz") else path + ".npz", **payload)

    @classmethod
    def load(cls, path: str, lan_list: Sequence[str],
             task_alphabets: Sequence[str]):
        """Rebuild a bank-mode suite saved by ``save`` (alphabets are cheap to
        recompute, so they are passed in rather than stored)."""
        from mrn_tpu.data.dataset import BankDataset
        src = cls.__new__(cls)
        with np.load(path) as z:
            src.bank = z["bank"]
            src.lan_list = list(lan_list)
            src._bank_dev = None
            src.trains, src.tests = {}, {}
            for split, store in (("train", src.trains), ("test", src.tests)):
                for lan in lan_list:
                    store[lan] = BankDataset(
                        int(z[f"{split}_{lan}_start"]),
                        [str(s) for s in z[f"{split}_{lan}_labels"]])
        src.dicts = {lan: list(a) for lan, a in zip(lan_list, task_alphabets)}
        return src

    def device_bank(self):
        """The whole suite as one device-resident uint8 array [N, H, W, 4];
        uploaded once, then every loader batch is just int32 indices into it
        (the HBM-resident dataset cache — the TPU-idiomatic feed for suites
        that fit on chip)."""
        if self.bank is None:
            return None
        if self._bank_dev is None:
            import jax
            self._bank_dev = jax.device_put(self.bank)
        return self._bank_dev

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
