"""MoCoAugment (reference data/dataset.py:291-317) and reset_fc
(modules/model.py:117-129) — API-parity features unused by reference configs."""

import random
from types import SimpleNamespace

import jax
import numpy as np
import PIL.Image

from mrn_tpu.data.transform import MoCoAugment


def test_moco_augment_two_normalized_views():
    random.seed(0)
    opt = SimpleNamespace(imgW=64, imgH=32)
    aug = MoCoAugment(opt)
    img = PIL.Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 96, 4), np.uint8), "RGBA")
    views = aug(img)
    assert len(views) == 2
    for v in views:
        assert v.shape == (32, 64, 4) and v.dtype == np.float32
        assert v.min() >= -1.0 - 1e-6 and v.max() <= 1.0 + 1e-6
    # independent random views
    assert not np.allclose(views[0], views[1])


def test_moco_grayscale_preserves_alpha():
    """The RandomGrayscale step must keep the RGBA alpha channel intact
    (it used to be reset to 255 by convert('L').convert('RGBA'))."""
    rgba = np.zeros((32, 64, 4), np.uint8)
    rgba[..., 0] = 200
    rgba[..., 1] = 50
    rgba[..., 3] = 37  # distinctive alpha
    img = PIL.Image.fromarray(rgba, "RGBA")
    out = MoCoAugment._grayscale(img)
    arr = np.asarray(out)
    assert np.all(arr[..., 3] == 37)
    # grayscale actually applied: R == G == B
    assert np.all(arr[..., 0] == arr[..., 1])
    assert np.all(arr[..., 1] == arr[..., 2])


def test_reset_fc_attn_mode_reinitializes_decoder():
    from mrn_tpu.models.surgery import reset_fc

    params = {
        "fc": {"kernel": np.zeros((8, 5), np.float32),
               "bias": np.zeros((5,), np.float32)},
        "prediction": {
            "attention_cell": {
                "i2h": {"kernel": np.zeros((8, 8), np.float32)},
                "w_ih": np.zeros((32, 16), np.float32),
                "b_hh": np.zeros((32,), np.float32),
            },
            "char_embeddings": np.zeros((5, 16), np.float32),
        },
        "other": {"kernel": np.ones((3, 3), np.float32)},
    }
    out = reset_fc(params, jax.random.PRNGKey(0),
                   prediction_path=("prediction",))
    cell = out["prediction"]["attention_cell"]
    assert not np.allclose(cell["i2h"]["kernel"], 0.0)
    assert not np.allclose(cell["w_ih"], 0.0)
    assert not np.allclose(cell["b_hh"], 0.0)
    assert not np.allclose(out["prediction"]["char_embeddings"], 0.0)
    # torch LSTMCell default: ALL gate leaves U(+-1/sqrt(hidden)); here
    # w_ih is [4H=32, in=16] so hidden=8 — NOT the input dim 16.
    bound = 1.0 / np.sqrt(8)
    assert np.all(np.abs(cell["w_ih"]) <= bound)
    # and it should actually use that full range, not a tighter wrong bound
    assert np.max(np.abs(cell["w_ih"])) > 1.0 / np.sqrt(16)
    np.testing.assert_array_equal(out["other"]["kernel"],
                                  params["other"]["kernel"])


def test_reset_fc_reinitializes_head_only():
    from mrn_tpu.models.surgery import reset_fc

    params = {
        "fc": {"kernel": np.zeros((8, 5), np.float32),
               "bias": np.zeros((5,), np.float32)},
        "other": {"kernel": np.ones((3, 3), np.float32)},
    }
    out = reset_fc(params, jax.random.PRNGKey(0))
    assert out["fc"]["kernel"].shape == (8, 5)
    assert not np.allclose(out["fc"]["kernel"], 0.0)
    bound = 1.0 / np.sqrt(8)
    assert np.all(np.abs(out["fc"]["bias"]) <= bound)
    np.testing.assert_array_equal(out["other"]["kernel"], params["other"]["kernel"])
