import os

import numpy as np
import pytest

from mrn_tpu.train.learners.base import BaseLearner

from helpers import make_manager, make_source, make_val, run_tasks, tiny_opt


@pytest.mark.slow
def test_base_learner_single_task(tmp_path):
    opt = tiny_opt(num_iter=8, val_interval=4,
                   output_dir=str(tmp_path / "saved"),
                   data_log=str(tmp_path / "data_any.txt"))
    source = make_source(opt)
    learner = BaseLearner(opt)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    val_ds = make_val(opt, source, 0)
    learner.incremental_train(0, source.cumulative_character(0), manager, val_ds)
    assert learner._total_classes == 3 + 4  # blank + PAD/UNK/space + abc
    # a best checkpoint was written
    ckpts = list((tmp_path / "saved" / opt.exp_name).glob("*_best_score.msgpack"))
    assert len(ckpts) == 1


@pytest.mark.slow
def test_base_learner_two_tasks_grows_classes(tmp_path):
    opt = tiny_opt(num_iter=4, val_interval=2, lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "saved"),
                   data_log=str(tmp_path / "data_any.txt"))
    source = make_source(opt)
    learner = BaseLearner(opt)
    best, ned = run_tasks(learner, opt, source, 2, tmp_path)
    assert learner._total_classes == 4 + 6  # special + abcdef
    assert learner._known_classes == learner._total_classes
    assert len(best) == 2
    # fc grew and old rows were preserved through surgery (smoke: shape check)
    assert learner.params["fc"]["kernel"].shape[1] == learner._total_classes


def test_base_learner_loss_decreases(tmp_path):
    opt = tiny_opt(num_iter=60, val_interval=60, batch_size=16,
                   output_dir=str(tmp_path / "saved"),
                   data_log=str(tmp_path / "data_any.txt"))
    source = make_source(opt, n_train=64)
    learner = BaseLearner(opt)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    val_ds = make_val(opt, source, 0)

    losses = []
    orig = learner._run_loop

    def spy_loop(*args, **kwargs):
        import mrn_tpu.utils.averager as avg_mod
        orig_add = avg_mod.Averager.add

        def spying_add(self, v):
            losses.append(float(np.asarray(v)))
            orig_add(self, v)

        avg_mod.Averager.add = spying_add
        try:
            return orig(*args, **kwargs)
        finally:
            avg_mod.Averager.add = orig_add

    learner._run_loop = spy_loop
    learner.incremental_train(0, source.cumulative_character(0), manager, val_ds)
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.8, (first, last)


@pytest.mark.slow
def test_start_task_resume(tmp_path):
    opt = tiny_opt(num_iter=4, val_interval=2, lan_list=["T0"],
                   output_dir=str(tmp_path / "saved"),
                   data_log=str(tmp_path / "data_any.txt"))
    source = make_source(opt)
    learner = BaseLearner(opt)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    val_ds = make_val(opt, source, 0)
    learner.incremental_train(0, source.cumulative_character(0), manager, val_ds)

    # fresh learner with start_task=1 loads the checkpoint instead of training
    opt2 = opt.replace(start_task=1)
    learner2 = BaseLearner(opt2)
    manager2 = make_manager(opt2, source)
    manager2.init_start(opt2, opt2.select_data, None, 0)
    learner2.incremental_train(0, source.cumulative_character(0), manager2,
                               make_val(opt2, source, 0))
    learner._load_best(0)  # best-score snapshot, not necessarily final params
    np.testing.assert_allclose(np.asarray(learner2.params["fc"]["kernel"]),
                               np.asarray(learner.params["fc"]["kernel"]))
