import numpy as np
import pytest

from mrn_tpu.codec import AttnLabelConverter, CTCLabelConverter, load_dict


def test_ctc_layout():
    conv = CTCLabelConverter(["a", "b", "c"])
    assert conv.character[:4] == ["[CTCblank]", "[PAD]", "[UNK]", " "]
    assert conv.character[4:] == ["a", "b", "c"]
    assert conv.blank_id == 0
    assert conv.dict["[PAD]"] == 1
    assert conv.dict["a"] == 4
    assert conv.num_classes == 7


def test_ctc_encode_decode_roundtrip():
    conv = CTCLabelConverter(list("abc"))
    idx, lens = conv.encode(["ab", "cba"], batch_max_length=5)
    assert idx.shape == (2, 5)
    assert list(lens) == [2, 3]
    assert idx[0, 2] == conv.pad_id  # padding
    # direct index decode (no repeats): lengths == word length
    out = conv.decode(idx, lens)
    assert out == ["ab", "cba"]


def test_ctc_decode_collapses_repeats_and_blanks():
    conv = CTCLabelConverter(list("ab"))
    a, b = conv.dict["a"], conv.dict["b"]
    seq = np.array([[0, a, a, 0, a, b, b, 0]])
    out = conv.decode(seq, np.array([8]))
    assert out == ["aab"]


def test_ctc_unknown_char_maps_to_unk():
    conv = CTCLabelConverter(list("ab"))
    idx, _ = conv.encode(["aZ"], batch_max_length=3)
    assert idx[0, 1] == conv.unk_id


def test_attn_layout_and_roundtrip():
    conv = AttnLabelConverter(list("xyz"))
    assert conv.character[:5] == ["[UNK]", "[PAD]", "[SOS]", "[EOS]", " "]
    idx, lens = conv.encode(["xy"], batch_max_length=4)
    assert idx.shape == (1, 6)  # max_len + 2
    assert idx[0, 0] == conv.sos_id
    assert idx[0, 3] == conv.eos_id
    assert list(lens) == [3]  # len + [EOS]
    decoded = conv.decode(idx[:, 1:], lens)
    assert decoded == ["xy[EOS]"]


def test_load_dict_cumulative(tmp_path):
    d1 = tmp_path / "t1"
    d2 = tmp_path / "t2"
    d1.mkdir()
    d2.mkdir()
    (d1 / "dict.txt").write_text("a\nb\n", encoding="utf-8")
    (d2 / "dict.txt").write_text("b\nc\n", encoding="utf-8")
    char = {}
    chars, char = load_dict(str(d1), char)
    assert chars == ["a", "b"]
    chars, char = load_dict(str(d2), char)
    assert chars == ["a", "b", "c"]  # insertion-ordered, deduped
