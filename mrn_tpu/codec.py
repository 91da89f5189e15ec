"""Label <-> index codecs and cumulative character-dictionary handling.

Mirrors the public behaviour of the reference converters
(reference: tools/utils.py:10-143) and the cumulative `load_dict`
(reference: tiny_train.py:37-53), reimplemented on numpy (host-side, feeds the
jitted steps with fixed-shape int32 arrays).

Token layouts (must match the reference exactly — they are load-bearing for
loss semantics and for checkpoint/parity comparisons):

- CTC:  index 0 = [CTCblank]; then [PAD], [UNK], ' ' and the characters
        (reference: tools/utils.py:15-31).
- Attn: [UNK], [PAD], [SOS], [EOS], ' ' then the characters
        (reference: tools/utils.py:85-98).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "CTCLabelConverter",
    "AttnLabelConverter",
    "load_dict",
    "build_converter",
]


def load_dict(path: str, char: Dict[str, int]) -> Tuple[List[str], Dict[str, int]]:
    """Accumulate characters from ``path``/dict.txt into the running ``char``
    map (insertion-ordered), returning the cumulative character list.

    Matches reference tiny_train.py:37-53: one character per line, newline
    stripped (other whitespace, e.g. an actual space character line, kept).
    """
    with open(os.path.join(path, "dict.txt"), encoding="utf-8") as f:
        for line in f:
            ch = line.rstrip("\n")
            if ch not in char:
                char[ch] = 1
    character = list(char.keys())
    return character, char


class CTCLabelConverter:
    """Text <-> index codec for CTC heads.

    ``character`` vocabulary: ``[CTCblank] [PAD] [UNK] ' ' <chars...>`` with
    the blank pinned at index 0 (reference: tools/utils.py:15-31).
    """

    def __init__(self, character: Sequence[str]):
        list_special = ["[PAD]", "[UNK]", " "]
        dict_character = list_special + list(character)
        # index 0 reserved for the CTC blank.
        self.dict: Dict[str, int] = {c: i + 1 for i, c in enumerate(dict_character)}
        self.character: List[str] = ["[CTCblank]"] + dict_character
        self.blank_id = 0
        self.pad_id = self.dict["[PAD]"]
        self.unk_id = self.dict["[UNK]"]

    @property
    def num_classes(self) -> int:
        return len(self.character)

    def encode(self, words: Sequence[str], batch_max_length: int = 25):
        """Returns ``(indices [B, batch_max_length] int32, lengths [B] int32)``.

        Padding uses [PAD] (does not affect CTC loss because lengths mask it)
        — reference: tools/utils.py:35-60.
        """
        b = len(words)
        out = np.full((b, batch_max_length), self.pad_id, dtype=np.int32)
        lengths = np.zeros((b,), dtype=np.int32)
        for i, word in enumerate(words):
            lengths[i] = len(word)
            idx = [self.dict.get(ch, self.unk_id) for ch in word]
            out[i, : len(idx)] = idx
        return out, lengths

    def decode(self, indices: np.ndarray, lengths: np.ndarray) -> List[str]:
        """Greedy CTC decode: collapse repeats then drop blanks
        (reference: tools/utils.py:62-76)."""
        indices = np.asarray(indices)
        words = []
        for row, length in zip(indices, np.asarray(lengths)):
            chars = []
            prev = -1
            for i in range(int(length)):
                t = int(row[i])
                if t != 0 and t != prev:
                    chars.append(self.character[t])
                prev = t
            words.append("".join(chars))
        return words


class AttnLabelConverter:
    """Text <-> index codec for attention heads.

    ``character`` vocabulary: ``[UNK] [PAD] [SOS] [EOS] ' ' <chars...>``
    (reference: tools/utils.py:85-98).
    """

    def __init__(self, character: Sequence[str]):
        list_special = ["[UNK]", "[PAD]", "[SOS]", "[EOS]", " "]
        self.character: List[str] = list_special + list(character)
        self.dict: Dict[str, int] = {c: i for i, c in enumerate(self.character)}
        self.unk_id = self.dict["[UNK]"]
        self.pad_id = self.dict["[PAD]"]
        self.sos_id = self.dict["[SOS]"]
        self.eos_id = self.dict["[EOS]"]

    @property
    def num_classes(self) -> int:
        return len(self.character)

    def encode(self, words: Sequence[str], batch_max_length: int = 25):
        """Returns ``(indices [B, batch_max_length+2], lengths [B])`` where
        row = [SOS] w_1..w_n [EOS] [PAD]... and length counts [EOS]
        (reference: tools/utils.py:102-134)."""
        b = len(words)
        width = batch_max_length + 2  # +1 [SOS], +1 [EOS]
        out = np.full((b, width), self.pad_id, dtype=np.int32)
        out[:, 0] = self.sos_id
        lengths = np.zeros((b,), dtype=np.int32)
        for i, word in enumerate(words):
            idx = [self.dict.get(ch, self.unk_id) for ch in word] + [self.eos_id]
            lengths[i] = len(idx)
            out[i, 1 : 1 + len(idx)] = idx
        return out, lengths

    def decode(self, indices: np.ndarray, lengths: np.ndarray) -> List[str]:
        """Join characters up to ``length`` (caller prunes at '[EOS]')
        (reference: tools/utils.py:136-143)."""
        indices = np.asarray(indices)
        words = []
        for row, length in zip(indices, np.asarray(lengths)):
            words.append("".join(self.character[int(t)] for t in row[: int(length)]))
        return words


def build_converter(prediction: str, character: Sequence[str]):
    """Pick the converter for a prediction head (reference: il_modules/base.py:118-126)."""
    if "CTC" in prediction:
        return CTCLabelConverter(character)
    return AttnLabelConverter(character)
