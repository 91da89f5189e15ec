import os

import cv2
import numpy as np
import pytest

from mrn_tpu.tools.create_lmdb import (create_dataset,
                                       create_dataset_with_valid_testset,
                                       create_from_lmdb_train_test_dataset,
                                       create_synth_mlt_dataset,
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


def test_create_from_lmdb_resplit(tmp_path, rng):
    """Re-split an existing LMDB 9:1 (reference create_lmdb_dataset.py:176-273)."""
    gt = _write_images(tmp_path, 40, rng)
    src = tmp_path / "src_lmdb"
    create_dataset(str(tmp_path), str(gt), str(src), map_size=1 << 24)

    out1 = tmp_path / "resplit_train"
    out2 = tmp_path / "resplit_test"
    n_train, n_test = create_from_lmdb_train_test_dataset(
        str(src), str(out1), str(out2), map_size=1 << 24, seed=3)
    assert n_train + n_test == 40
    assert 1 <= n_test <= 12
    assert (out1 / "dict.txt").exists()

    from mrn_tpu.config import default_options
    from mrn_tpu.data.dataset import LmdbDataset
    ds = LmdbDataset(str(out1), default_options(), mode="train")
    assert len(ds) == n_train
    _, label = ds[0]
    assert label.startswith("word")


def test_create_synth_mlt_dataset(tmp_path, rng):
    """Parallel path/label lists (reference create_lmdb_dataset.py:351-424)."""
    _write_images(tmp_path, 4, rng)
    paths = [str(tmp_path / "raw" / f"img{i:03d}.png") for i in range(4)]
    paths.append(str(tmp_path / "raw" / "missing.png"))  # skipped, not fatal
    labels = [f"synth{i}" for i in range(5)]
    out = tmp_path / "synth_lmdb"
    n = create_synth_mlt_dataset(paths, labels, str(out), map_size=1 << 24)
    assert n == 4
    assert (out / "dict.txt").exists()

    from mrn_tpu.config import default_options
    from mrn_tpu.data.dataset import LmdbDataset
    ds = LmdbDataset(str(out), default_options(), mode="train")
    _, label = ds[0]
    assert label.startswith("synth")


def test_create_dataset_with_valid_testset(tmp_path, rng):
    """training/validation/evaluation tree + gt side files (reference
    create_lmdb_dataset.py:427-556; tab-separated gt format)."""
    img_dir = tmp_path / "raw"
    img_dir.mkdir()
    lines = []
    for i in range(30):
        img = rng.integers(0, 255, size=(20, 40, 3)).astype(np.uint8)
        name = f"img{i:03d}.png"
        cv2.imwrite(str(img_dir / name), img)
        lines.append(f"raw/{name}\tword{i}")
    gt = tmp_path / "gt.txt"
    gt.write_text("\n".join(lines) + "\n", encoding="utf-8")

    n_train, n_valid, n_test = create_dataset_with_valid_testset(
        str(tmp_path), str(gt), str(tmp_path / "out"), "ds",
        validset_percent=10, testset_percent=10, map_size=1 << 24)
    assert (n_train, n_valid, n_test) == (24, 3, 3)
    assert (tmp_path / "gt_train.txt").exists()
    assert (tmp_path / "gt_valid.txt").exists()
    assert (tmp_path / "gt_test.txt").exists()

    from mrn_tpu.config import default_options
    from mrn_tpu.data.dataset import LmdbDataset
    for split, expected in (("training", 24), ("validation", 3),
                            ("evaluation", 3)):
        ds = LmdbDataset(str(tmp_path / "out" / split / "ds"),
                         default_options(), mode="train")
        assert len(ds) == expected, split

    # no testset: validation only (reference 548-551)
    n_train, n_valid, n_test = create_dataset_with_valid_testset(
        str(tmp_path), str(gt), str(tmp_path / "out2"), "ds",
        validset_percent=10, testset_percent=0, map_size=1 << 24)
    assert (n_train, n_valid, n_test) == (27, 3, 0)


def test_create_dataset_valid_testset_skip_at_boundary(tmp_path, rng):
    """A missing image landing exactly on a split boundary must not swallow
    the train->valid transition, and num-samples must record the counts
    actually written (the reference's post-continue check loses both)."""
    img_dir = tmp_path / "raw"
    img_dir.mkdir()
    lines = []
    for i in range(30):
        img = rng.integers(0, 255, size=(20, 40, 3)).astype(np.uint8)
        name = f"img{i:03d}.png"
        cv2.imwrite(str(img_dir / name), img)
        lines.append(f"raw/{name}\tword{i}")
    gt = tmp_path / "gt.txt"
    gt.write_text("\n".join(lines) + "\n", encoding="utf-8")

    # find which shuffled position each sample lands at for seed 1111 and
    # delete the image that falls at the end-of-train boundary (index 23)
    import random as _random
    shuffled = list(lines)
    _random.Random(1111).shuffle(shuffled)
    boundary_img = shuffled[23].split("\t")[0]
    os.remove(str(tmp_path / boundary_img))

    n_train, n_valid, n_test = create_dataset_with_valid_testset(
        str(tmp_path), str(gt), str(tmp_path / "out"), "ds",
        validset_percent=10, testset_percent=10, map_size=1 << 24)
    assert (n_train, n_valid, n_test) == (23, 3, 3)

    from mrn_tpu.config import default_options
    from mrn_tpu.data.dataset import LmdbDataset
    for split, expected in (("training", 23), ("validation", 3),
                            ("evaluation", 3)):
        ds = LmdbDataset(str(tmp_path / "out" / split / "ds"),
                         default_options(), mode="train")
        assert len(ds) == expected, split
        # every indexed record must resolve to a real label (dense keys)
        assert all(ds[k][1].startswith("word") for k in range(len(ds)))


def test_char_accuracy_report(tmp_path):
    """Per-char recall + frequency-bucket averages (reference utils.py:233-278)."""
    from mrn_tpu.tools.analysis import (char_accuracy, char_accuracy_report,
                                        char_frequency)

    total = tmp_path / "all.txt"
    true = tmp_path / "true.txt"
    total.write_text("ab\nab\nac\n", encoding="utf-8")   # a:3 b:2 c:1
    true.write_text("ab\nac\n", encoding="utf-8")        # a:2 b:1 c:1
    assert char_frequency(str(total)) == {"a": 3, "b": 2, "c": 1}

    table = char_accuracy(str(true), str(total))
    assert table == [("c", 1, 1.0), ("b", 2, 0.5), ("a", 3, 2 / 3)]

    out = tmp_path / "report.txt"
    lines = char_accuracy_report(str(true), str(total), str(out))
    content = out.read_text(encoding="utf-8")
    assert "avg 1 char is 1.00 total 1" in content
    assert "avg 2 char is 0.50 total 1" in content
    assert "avg 3 char is 0.67 total 1" in content  # final bucket flushed
    assert len(lines) == 6  # 3 bucket lines + 3 table rows


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
