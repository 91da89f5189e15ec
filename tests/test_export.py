"""AOT export roundtrip: export_cli.export_inference serializes a
checkpoint-free learner's inference to StableHLO; deserialize + call must
match the learner's own jitted eval logits."""

import numpy as np

from helpers import tiny_opt


def test_export_roundtrip_matches_direct_eval():
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from export_cli import export_inference
    from mrn_tpu.train.learners.base import BaseLearner

    opt = tiny_opt(lan_list=["T0"])
    learner = BaseLearner(opt)
    learner.character = list("abc")
    learner.converter = learner.build_converter()
    learner.build_model()

    blob, out_avals = export_inference(learner, opt, batch_size=2,
                                       dtype_name="f32")
    assert len(blob) > 1000

    img = np.random.default_rng(0).normal(
        size=(2, opt.imgH, opt.imgW, opt.input_channel)).astype(np.float32)
    served = np.asarray(jexport.deserialize(blob).call(jnp.asarray(img)))

    variables = {"params": learner.params, "batch_stats": learner.batch_stats}
    direct = np.asarray(
        learner.model.apply(variables, jnp.asarray(img), train=False)["predict"])
    assert served.shape == direct.shape
    np.testing.assert_allclose(served, direct, atol=1e-5)


def test_export_int8_roundtrip():
    """Quantized export: calibrate+quantize the learner in place (the same
    helper evaluate_cli --int8 / export_cli --int8 use), export, and check
    the served int8 graph matches the learner's own int8 eval exactly."""
    import jax.numpy as jnp
    from jax import export as jexport

    from export_cli import export_inference
    from evaluate_cli import quantize_learner_int8
    from mrn_tpu.train.learners.base import BaseLearner

    opt = tiny_opt(lan_list=["T0"])
    learner = BaseLearner(opt)
    learner.character = list("abc")
    learner.converter = learner.build_converter()
    learner.build_model()

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, opt.imgH, opt.imgW,
                           opt.input_channel)).astype(np.float32)
    calib = [(jnp.asarray(img), ["ab", "c"])]
    quantize_learner_int8(learner, opt, calib, n_batches=1)
    assert learner.eval_quant is not None

    blob, _ = export_inference(learner, opt, batch_size=2, dtype_name="f32")
    served = np.asarray(jexport.deserialize(blob).call(jnp.asarray(img)))

    variables = {"params": learner.params,
                 "batch_stats": learner.batch_stats,
                 "quant": learner.eval_quant}
    direct = np.asarray(
        learner.model.apply(variables, jnp.asarray(img),
                            train=False)["predict"])
    np.testing.assert_allclose(served, direct, atol=1e-5)
