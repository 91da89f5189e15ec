import os

import cv2
import numpy as np
import pytest

from mrn_tpu.tools.create_lmdb import (create_dataset,
                                       create_train_test_dataset)
from mrn_tpu.tools.crop_by_word import (collect_files, crop_img,
                                        generate_ann, load_img_info)


def _write_images(tmp_path, n, rng):
    img_dir = tmp_path / "raw"
    img_dir.mkdir()
    lines = []
    for i in range(n):
        img = rng.integers(0, 255, size=(20, 40, 3)).astype(np.uint8)
        name = f"img{i:03d}.png"
        cv2.imwrite(str(img_dir / name), img)
        lines.append(f"raw/{name},Latin,word{i}")
    gt = tmp_path / "gt.txt"
    gt.write_text("\n".join(lines), encoding="utf-8")
    return gt


def test_create_dataset_roundtrip(tmp_path, rng):
    gt = _write_images(tmp_path, 5, rng)
    out = tmp_path / "lmdb_out"
    n = create_dataset(str(tmp_path), str(gt), str(out), map_size=1 << 24)
    assert n == 5
    assert (out / "dict.txt").exists()
    dict_chars = (out / "dict.txt").read_text(encoding="utf-8").splitlines()
    assert set("word0123456789"[:4]) <= set(dict_chars) or "w" in dict_chars

    from mrn_tpu.config import default_options
    from mrn_tpu.data.dataset import LmdbDataset
    ds = LmdbDataset(str(out), default_options(), mode="train")
    assert len(ds) == 5
    img, label = ds[0]
    assert label.startswith("word")


def test_create_train_test_split(tmp_path, rng):
    gt = _write_images(tmp_path, 50, rng)
    out1 = tmp_path / "train_lmdb"
    out2 = tmp_path / "test_lmdb"
    n_train, n_test = create_train_test_dataset(
        str(tmp_path), str(gt), str(out1), str(out2), map_size=1 << 24, seed=1)
    assert n_train + n_test == 50
    assert 1 <= n_test <= 15  # ~10%


def test_crop_by_word_pipeline(tmp_path, rng):
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    img = rng.integers(0, 255, size=(100, 200, 3)).astype(np.uint8)
    cv2.imwrite(str(img_dir / "scene1.png"), img)
    (gt_dir / "gt_scene1.txt").write_text(
        "10,10,80,10,80,40,10,40,Latin,hello\n"
        "100,50,180,50,180,90,100,90,Latin,world\n", encoding="utf-8")

    files = collect_files(str(img_dir), str(gt_dir))
    infos = [load_img_info(f) for f in files]
    assert len(infos[0]["anno_info"]) == 2
    out_dir = tmp_path / "out"
    lines = generate_ann(str(tmp_path), infos, str(out_dir))
    assert len(lines) == 2
    assert (out_dir / "label.txt").exists()
    crops = os.listdir(out_dir / "imgs")
    assert len(crops) == 2
    # padded crop larger than the raw box
    c = cv2.imread(str(out_dir / "imgs" / crops[0]))
    assert c.shape[0] > 30 and c.shape[1] > 70


def test_crop_img_padding(rng):
    img = rng.integers(0, 255, size=(50, 100, 3)).astype(np.uint8)
    box = [20, 20, 60, 20, 60, 30, 20, 30]  # wide box: h=10, w=40
    crop = crop_img(img, box)
    # vertical pad 0.2*10=2 both sides, horizontal 0.4*10=4 both sides
    assert crop.shape[0] == 14  # rows 18..32
    assert crop.shape[1] == 48  # cols 16..64
