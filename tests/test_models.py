import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mrn_tpu.config import default_options
from mrn_tpu.models.composer import Recognizer, build_recognizer, sequence_length
from mrn_tpu.models.lstm import BidirectionalLSTM
from mrn_tpu.models.surgery import apply_reference_init, count_params, grow_fc, weight_align

KEY = jax.random.PRNGKey(0)


def _init_and_apply(model, image, **kw):
    variables = model.init({"params": KEY, "droppath": KEY}, image, train=False, **kw)
    out = model.apply(variables, image, train=False, **kw)
    return variables, out


# ---------- LSTM parity ----------

def test_bilstm_matches_torch(rng):
    b, t, in_size, h, out = 2, 5, 6, 4, 3
    x = rng.normal(size=(b, t, in_size)).astype(np.float32)
    model = BidirectionalLSTM(hidden_size=h, output_size=out)
    variables = model.init(KEY, jnp.asarray(x))
    params = variables["params"]

    tm = torch.nn.LSTM(in_size, h, bidirectional=True, batch_first=True)
    lin = torch.nn.Linear(2 * h, out)
    with torch.no_grad():
        tm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["rnn"]["fwd"]["w_ih"])))
        tm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["rnn"]["fwd"]["w_hh"])))
        tm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["rnn"]["fwd"]["b_ih"])))
        tm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["rnn"]["fwd"]["b_hh"])))
        tm.weight_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(params["rnn"]["bwd"]["w_ih"])))
        tm.weight_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(params["rnn"]["bwd"]["w_hh"])))
        tm.bias_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(params["rnn"]["bwd"]["b_ih"])))
        tm.bias_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(params["rnn"]["bwd"]["b_hh"])))
        lin.weight.copy_(torch.from_numpy(np.asarray(params["linear"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(params["linear"]["bias"])))
        theirs = lin(tm(torch.from_numpy(x))[0]).numpy()

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


# ---------- backbone shapes ----------

@pytest.mark.parametrize("feat,seq,pred,trans", [
    ("VGG", "BiLSTM", "CTC", "None"),       # CRNN
    ("SVTR", "None", "CTC", "None"),        # SVTR
])
def test_recognizer_shapes(rng, feat, seq, pred, trans):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32,
                          Transformation=trans, FeatureExtraction=feat,
                          SequenceModeling=seq, Prediction=pred)
    n_cls = 11
    model = build_recognizer(opt, n_cls)
    image = jnp.asarray(rng.normal(size=(2, 32, 64, 4)).astype(np.float32))
    _, out = _init_and_apply(model, image)
    t = sequence_length(feat, 64)
    assert out["predict"].shape == (2, t, n_cls)
    assert out["feature"].shape == (2, t, opt.hidden_size)


def test_trba_shapes(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32,
                          num_fiducial=8, Transformation="TPS",
                          FeatureExtraction="ResNet", SequenceModeling="BiLSTM",
                          Prediction="Attn", batch_max_length=8)
    n_cls = 13
    model = build_recognizer(opt, n_cls)
    image = jnp.asarray(rng.normal(size=(2, 32, 64, 4)).astype(np.float32))
    text = jnp.zeros((2, 9), jnp.int32)
    variables = model.init({"params": KEY}, image, text=text, train=False)
    out = model.apply(variables, image, text=text, train=False, is_train=True)
    assert out["predict"].shape == (2, 9, n_cls)  # batch_max_length + 1 steps
    assert out["feature"].shape == (2, sequence_length("ResNet", 64), 32)
    # greedy eval path
    out_eval = model.apply(variables, image, text=text[:, :1], train=False,
                           is_train=False)
    assert out_eval["predict"].shape == (2, 9, n_cls)


def test_recognizer_train_mode_runs(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32)
    model = build_recognizer(opt, 7)
    image = jnp.asarray(rng.normal(size=(2, 32, 64, 4)).astype(np.float32))
    variables = model.init({"params": KEY}, image, train=False)
    out, mutated = model.apply(variables, image, train=True,
                               mutable=["batch_stats"],
                               rngs={"droppath": KEY})
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out["predict"])).all()


# ---------- surgery ----------

def test_apply_reference_init_rules(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32)
    model = build_recognizer(opt, 7)
    image = jnp.asarray(rng.normal(size=(1, 32, 64, 4)).astype(np.float32))
    variables = model.init({"params": KEY}, image, train=False)
    params = apply_reference_init(variables["params"], jax.random.PRNGKey(1))
    # biases zero, BN scales one
    flat = flax.traverse_util.flatten_dict(params)
    for path, leaf in flat.items():
        if path[-1] in ("bias", "b_ih", "b_hh"):
            assert float(jnp.abs(leaf).max()) == 0.0, path
        if path[-1] == "scale":
            assert float(jnp.abs(leaf - 1.0).max()) == 0.0, path
    # kaiming std on a conv kernel: fan_in = 4*3*3 = 36 -> std ~ sqrt(2/36)
    k = flat[("extractor", "feature", "conv0", "Conv_0", "kernel")]
    assert abs(float(k.std()) - np.sqrt(2 / 36)) < 0.05


def test_tps_fc2_skipped_by_init(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32,
                          num_fiducial=8, Transformation="TPS",
                          FeatureExtraction="ResNet", Prediction="CTC")
    model = build_recognizer(opt, 7)
    image = jnp.asarray(rng.normal(size=(1, 32, 64, 4)).astype(np.float32))
    variables = model.init({"params": KEY}, image, train=False)
    params = apply_reference_init(variables["params"], jax.random.PRNGKey(1))
    flat = flax.traverse_util.flatten_dict(params)
    fc2 = {p: l for p, l in flat.items() if "localization_fc2" in p}
    kernels = [l for p, l in fc2.items() if p[-1] == "kernel"]
    biases = [l for p, l in fc2.items() if p[-1] == "bias"]
    assert float(jnp.abs(kernels[0]).max()) == 0.0  # zero-weight init kept
    assert float(jnp.abs(biases[0]).max()) > 0.0    # fiducial bias kept


def test_grow_fc_preserves_old_rows(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32)
    image = jnp.asarray(rng.normal(size=(1, 32, 64, 4)).astype(np.float32))
    m1 = build_recognizer(opt, 5)
    v1 = m1.init({"params": KEY}, image, train=False)
    m2 = build_recognizer(opt, 9)
    v2 = m2.init({"params": jax.random.PRNGKey(2)}, image, train=False)
    grown = grow_fc(v2["params"], v1["params"])
    np.testing.assert_array_equal(np.asarray(grown["fc"]["kernel"][:, :5]),
                                  np.asarray(v1["params"]["fc"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(grown["fc"]["bias"][:5]),
                                  np.asarray(v1["params"]["fc"]["bias"]))
    # new columns differ from old ones (freshly initialized)
    assert np.abs(np.asarray(grown["fc"]["kernel"][:, 5:])).max() > 0


def test_weight_align_matches_torch_formula(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32)
    image = jnp.asarray(rng.normal(size=(1, 32, 64, 4)).astype(np.float32))
    m = build_recognizer(opt, 9)
    v = m.init({"params": KEY}, image, train=False)
    kernel = np.asarray(v["params"]["fc"]["kernel"])
    inc = 4
    tw = torch.from_numpy(kernel.T.copy())  # torch layout [out, in]
    newnorm = torch.norm(tw[-inc:, :], p=2, dim=1)
    oldnorm = torch.norm(tw[:-inc, :], p=2, dim=1)
    gamma_ref = float(oldnorm.mean() / newnorm.mean())
    aligned, gamma = weight_align(v["params"], inc)
    assert gamma == pytest.approx(gamma_ref, rel=1e-5)
    np.testing.assert_allclose(np.asarray(aligned["fc"]["kernel"][:, -inc:]),
                               kernel[:, -inc:] * gamma_ref, rtol=1e-5)


def test_count_params(rng):
    opt = default_options(imgW=64, output_channel=64, hidden_size=32)
    m = build_recognizer(opt, 5)
    image = jnp.asarray(rng.normal(size=(1, 32, 64, 4)).astype(np.float32))
    v = m.init({"params": KEY}, image, train=False)
    assert count_params(v["params"]) > 10000
