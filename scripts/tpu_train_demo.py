"""End-to-end TPU training demo: builds a synthetic 2-task LMDB tree with the
native store and runs the full train.py task loop (CRNN, il=mrn) on the chip."""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrn_tpu.config import default_options
from mrn_tpu.data.lmdb_store import LmdbWriter
from mrn_tpu.data.synthetic import make_task_dataset
from mrn_tpu.tools.create_lmdb import write_dict_txt
from mrn_tpu.utils.logging import ExperimentLog
import train as train_mod

ROOT = "/tmp/mrn_demo"


def build_tree(root, lan, alphabet, n, seed):
    path = os.path.join(root, lan)
    os.makedirs(path, exist_ok=True)
    ds = make_task_dataset(alphabet, n, img_w=256, max_len=8, seed=seed)
    w = LmdbWriter(path, map_size=1 << 28)
    w.put(b"num-samples", str(n).encode())
    lexicon = set()
    for i in range(n):
        img, label = ds[i]
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w.put(b"image-%09d" % (i + 1), buf.getvalue())
        w.put(b"label-%09d" % (i + 1), label.encode())
        lexicon.update(label)
    w.commit()
    write_dict_txt(sorted(lexicon), os.path.join(path, "dict"))


def main():
    lans = ["T0", "T1"]
    alphabets = ["abcdef", "ghijkl"]
    train_root = os.path.join(ROOT, "train")
    test_root = os.path.join(ROOT, "test")
    for i, lan in enumerate(lans):
        build_tree(train_root, lan, alphabets[i], 600, seed=i)
        build_tree(test_root, lan, alphabets[i], 100, seed=10 + i)
    print("LMDB trees built")

    opt = default_options(
        exp_name="tpu_demo_mrn", il="mrn", memory="random", memory_num=64,
        batch_size=64, num_iter=120, val_interval=60, batch_max_length=8,
        lan_list=lans, select_data=[train_root], valid_datas=[test_root],
        output_channel=512, hidden_size=256,
        workers=0, output_dir=os.path.join(ROOT, "saved"),
        data_log=os.path.join(ROOT, "data_any.txt"))

    log = ExperimentLog(opt.exp_name, opt.output_dir, opt.data_log, echo=True)
    t0 = time.time()
    best, ned = train_mod.train(opt, log)
    print(f"finished in {time.time() - t0:.0f}s; per-task accs: {best}")


if __name__ == "__main__":
    main()
