"""Mixed-precision training (opt.train_dtype="bf16"): forward/backward in
bf16 with f32 master params; the loop must train (loss decreases on the
learnable synthetic task) and keep params/opt-state/BN stats in f32."""

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.data.manager import ValDataset
from mrn_tpu.train.learners.base import BaseLearner

from helpers import make_manager, make_source, tiny_opt


def test_bf16_train_step_trains_and_keeps_f32_master(tmp_path):
    opt = tiny_opt(lan_list=["T0"], num_iter=60, val_interval=30,
                   train_dtype="bf16",
                   output_dir=str(tmp_path / "s"),
                   data_log=str(tmp_path / "d.txt"))
    source = make_source(opt, n_train=64)
    learner = BaseLearner(opt)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    val = ValDataset(["synth_test/T0"], opt, dataset_factory=source.val_factory)
    learner.incremental_train(0, source.cumulative_character(0), manager, val)

    # master params stayed f32
    for leaf in jax.tree_util.tree_leaves(learner.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(learner.batch_stats):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype

    # it actually learned: loss moved well below the initial CTC plateau
    log = (tmp_path / "s" / opt.exp_name / "log_train.txt").read_text()
    losses = [float(line.split("Train_loss: ")[1].split(",")[0])
              for line in log.splitlines() if "Train_loss" in line]
    assert len(losses) >= 2
    assert losses[-1] < losses[0] * 0.7, losses


def test_bf16_forward_matches_f32_coarsely(tmp_path):
    """bf16 logits track the f32 logits (same params, rounding-level diff)."""
    opt = tiny_opt(lan_list=["T0"])
    source = make_source(opt)
    learner = BaseLearner(opt)
    learner.character = list("abc")
    learner.converter = learner.build_converter()
    learner.build_model()

    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, opt.imgH, opt.imgW, 4)).astype(np.float32))
    batch = {"image": img, "label": jnp.zeros((2, 9), jnp.int32),
             "length": jnp.ones((2,), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    f32_preds, _ = learner._apply_train(learner.params, learner.batch_stats,
                                        batch, rng)
    learner.opt.train_dtype = "bf16"
    bf16_preds, _ = learner._apply_train(learner.params, learner.batch_stats,
                                         batch, rng)
    assert bf16_preds.dtype == jnp.float32  # cast back for the loss
    denom = np.maximum(np.abs(np.asarray(f32_preds)), 1.0)
    rel = np.abs(np.asarray(bf16_preds) - np.asarray(f32_preds)) / denom
    assert rel.max() < 0.15, rel.max()
