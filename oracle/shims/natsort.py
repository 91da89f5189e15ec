"""``natsort`` shim — numeric-aware sort, enough for RawDataset file listing."""

import re


def _key(s):
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", str(s))]


def natsorted(seq, key=None):
    return sorted(seq, key=(lambda x: _key(key(x))) if key else _key)
