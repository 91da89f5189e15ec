"""Post-training w8a8 quantization (mrn_tpu.ops.int8): op-level exactness,
calibrate -> quantize -> int8-apply round trip, and the evaluate_cli --int8
accuracy parity on a trained tiny model.

The reference has no quantized path (pure fp32 torch); int8 is the
TPU-native ~2x lever on the compute-bound TRBA ResNet (modules/
feature_extraction.py:100-352 equivalent, 21.5 GFLOP/img)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer
from mrn_tpu.ops.int8 import (conv_int8, quantize_act, quantize_kernel,
                              quantize_variables)


def test_conv_int8_matches_integer_math():
    """int8 x int8 -> int32 conv is exact integer arithmetic: dequantized
    output equals the f32 conv of the dequantized operands."""
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    kq, w_scale = quantize_kernel(k)
    xq, a_scale = quantize_act(x, jnp.max(jnp.abs(x)))
    y = conv_int8(xq, kq, (1, 1), [(1, 1), (1, 1)])
    assert y.dtype == jnp.int32
    deq = y.astype(jnp.float32) * (a_scale * w_scale)
    ref = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32) * a_scale, kq.astype(jnp.float32) * w_scale,
        (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(deq), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_quantize_kernel_per_channel():
    k = jnp.stack([jnp.full((3, 3, 4), 0.5), jnp.full((3, 3, 4), 2.0)], -1)
    kq, scale = quantize_kernel(k)
    assert kq.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(scale), [0.5 / 127, 2.0 / 127],
                               rtol=1e-6)
    assert int(np.abs(np.asarray(kq)).max()) == 127  # full range per channel


@pytest.mark.parametrize("feature", ["VGG", "ResNet"])
def test_calibrate_quantize_roundtrip(feature):
    """calib apply populates act_amax for every conv; quantize_variables
    rewrites exactly those kernels to int8; the int8 model runs and stays
    within quantization error of the f32 model at every conv."""
    opt = default_options(Transformation="None", FeatureExtraction=feature,
                          SequenceModeling="None", Prediction="CTC",
                          output_channel=64, hidden_size=32, imgH=32, imgW=64)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 4))
    m = build_recognizer(opt, 10)
    v = m.init({"params": jax.random.PRNGKey(0)}, img, train=False)

    m_cal = build_recognizer(opt, 10, quant="calib")
    _, upd = m_cal.apply(v, img, train=False, mutable=["quant"])
    n_convs = sum(1 for p in jax.tree_util.tree_leaves_with_path(upd["quant"])
                  if p[0][-1].key == "act_amax")
    assert n_convs == (7 if feature == "VGG" else 32)

    qv = quantize_variables(dict(v, quant=upd["quant"]))
    kernels = [l for path, l in
               jax.tree_util.tree_leaves_with_path(qv["params"])
               if path[-1].key == "kernel" and l.ndim == 4]
    assert kernels and all(k.dtype == jnp.int8 for k in kernels)

    m_i8 = build_recognizer(opt, 10, quant="int8")
    out_f32 = m.apply(v, img, train=False, method="features_only")
    out_i8 = m_i8.apply(qv, img, train=False, method="features_only")
    a, b = np.asarray(out_f32), np.asarray(out_i8)
    # per-layer quantization error is 1-3% (7-bit symmetric activations);
    # bound the accumulated feature error well below signal scale
    assert np.abs(a - b).mean() <= 0.1 * np.abs(a).mean() + 1e-6


def test_calibrate_quantize_roundtrip_svtr():
    """SVTR: every block's 4 projections calibrate and quantize; the int8
    model (composed path on CPU) stays within quantization error of f32."""
    opt = default_options(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC",
                          output_channel=64, hidden_size=32, imgH=32,
                          imgW=64)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 4))
    m = build_recognizer(opt, 10)
    v = m.init({"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(2)},
               img, train=False)

    m_cal = build_recognizer(opt, 10, quant="calib")
    _, upd = m_cal.apply(v, img, train=False, mutable=["quant"])
    amaxes = [p for p, l in jax.tree_util.tree_leaves_with_path(upd["quant"])
              if p[-1].key.startswith("act_amax_")]
    # 12 blocks x (4 projections + q/k/v attention scales)
    assert len(amaxes) == 12 * 7

    qv = quantize_variables(dict(v, quant=upd["quant"]))
    qkv_kernels = [l for path, l in
                   jax.tree_util.tree_leaves_with_path(qv["params"])
                   if path[-1].key in ("qkv_kernel", "proj_kernel",
                                       "fc1_kernel", "fc2_kernel")]
    assert len(qkv_kernels) == 12 * 4
    assert all(k.dtype == jnp.int8 for k in qkv_kernels)
    # conv kernels (patch embed / subsample) deliberately stay float
    assert all(l.dtype != jnp.int8 for path, l in
               jax.tree_util.tree_leaves_with_path(qv["params"])
               if path[-1].key == "kernel")

    m_i8 = build_recognizer(opt, 10, quant="int8")
    out_f32 = m.apply(v, img, train=False, method="features_only")
    out_i8 = m_i8.apply(qv, img, train=False, method="features_only")
    a, b = np.asarray(out_f32), np.asarray(out_i8)
    assert np.abs(a - b).mean() <= 0.1 * np.abs(a).mean() + 1e-6


@pytest.mark.slow
def test_int8_eval_cli_accuracy_parity(tmp_path):
    """evaluate_cli --int8 on a trained tiny CRNN matches the f32 word
    accuracy (w8a8 PTQ costs no accuracy at this scale)."""
    import subprocess
    import sys
    import os

    from helpers import make_source, make_manager, make_val, tiny_opt
    from mrn_tpu.train.learners.base import BaseLearner

    opt = tiny_opt(num_iter=60, val_interval=30, lan_list=["T0"],
                   output_dir=str(tmp_path / "saved"),
                   data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = BaseLearner(opt)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    val_ds = make_val(opt, source, 0)
    learner.incremental_train(0, source.cumulative_character(0), manager,
                              val_ds)
    res_f32 = learner.run_validation(val_ds.create_dataset(), "test")

    # quantize in-process (the CLI path needs on-disk LMDB; the learner-level
    # helper is the same code evaluate_cli calls)
    from evaluate_cli import quantize_learner_int8
    quantize_learner_int8(learner, opt, val_ds.create_dataset())
    res_i8 = learner.run_validation(val_ds.create_dataset(), "test")
    assert abs(res_i8.score - res_f32.score) <= 5.0  # word-acc points
