"""Export the synthetic AIA suite to on-disk LMDB trees in the torch
reference's expected layout, so /root/reference/tiny_train.py can run
unmodified (via oracle/run_reference.py) as a system-level behavioral oracle.

Layout (reference tiny_train.py:264-269, data_manage.py:127-146):
    <out>/synth_train/<lan>/{data.mdb, dict.txt}
    <out>/synth_test/<lan>/data.mdb

Images are PNG-encoded RGBA (the reference decodes with
PIL.Image.open(...).convert("RGBA"), dataset.py:103-107).

    python scripts/export_oracle_lmdb.py --out oracle/data \
        [--train_cap 1500] [--test_cap 300]
"""

import argparse
import io
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrn_tpu.config import default_options
from mrn_tpu.data.lmdb_store import LmdbWriter
from scripts.accuracy_campaign import LANS, build_source


def export_split(source, split, lans, out_root, cap, rng):
    store = source.trains if split == "train" else source.tests
    for lan in lans:
        ds = store[lan]
        n = min(cap, len(ds)) if cap else len(ds)
        sel = (rng.choice(len(ds), n, replace=False)
               if n < len(ds) else np.arange(len(ds)))
        path = os.path.join(out_root, lan)
        os.makedirs(path, exist_ok=True)
        writer = LmdbWriter(path, map_size=1 << 31)
        cache = {}
        for k, i in enumerate(sel, start=1):
            bank_idx, label = ds[int(i)]
            img = source.bank[int(bank_idx)]
            buf = io.BytesIO()
            Image.fromarray(img, "RGBA").save(buf, format="PNG")
            cache[b"image-%09d" % k] = buf.getvalue()
            cache[b"label-%09d" % k] = label.encode("utf-8")
            if len(cache) >= 500:
                writer.write_batch(cache)
                cache = {}
        cache[b"num-samples"] = str(len(sel)).encode()
        writer.write_batch(cache)
        writer.commit()
        writer.close()
        if split == "train":
            with open(os.path.join(path, "dict.txt"), "w",
                      encoding="utf-8") as f:
                for ch in source.dicts[lan]:
                    f.write(ch + "\n")
        print(f"{split}/{lan}: {len(sel)} samples -> {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="oracle/data")
    ap.add_argument("--train_cap", type=int, default=1500)
    ap.add_argument("--test_cap", type=int, default=300)
    ap.add_argument("--tasks", type=int, default=6)
    ap.add_argument("--shared", type=int, default=0,
                    help="shared glyph slice size (the overlap suite, "
                         "accuracy_campaign --shared); use a distinct --out")
    args = ap.parse_args()

    opt = default_options(imgH=32, imgW=256)
    source = build_source(opt, seed=111, cache_dir="ACCURACY_RUNS",
                          shared=args.shared)
    lans = LANS[:args.tasks]
    rng = np.random.default_rng(7)
    export_split(source, "train", lans,
                 os.path.join(args.out, "synth_train"), args.train_cap, rng)
    export_split(source, "test", lans,
                 os.path.join(args.out, "synth_test"), args.test_cap, rng)


if __name__ == "__main__":
    main()
