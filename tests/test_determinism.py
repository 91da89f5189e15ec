import numpy as np
import pytest

from mrn_tpu.train.learners.base import BaseLearner

from helpers import make_manager, make_source, make_val, tiny_opt


def _train_once(tmp_path, tag):
    opt = tiny_opt(num_iter=5, val_interval=5, exp_name=f"det_{tag}",
                   output_dir=str(tmp_path / f"s{tag}"),
                   data_log=str(tmp_path / f"d{tag}.txt"))
    source = make_source(opt)
    learner = BaseLearner(opt)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    learner.incremental_train(0, source.cumulative_character(0), manager,
                              make_val(opt, source, 0))
    return learner.params


@pytest.mark.slow
def test_training_is_deterministic_under_fixed_seed(tmp_path):
    p1 = _train_once(tmp_path, "a")
    p2 = _train_once(tmp_path, "b")
    np.testing.assert_array_equal(np.asarray(p1["fc"]["kernel"]),
                                  np.asarray(p2["fc"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(p1["extractor"]["seq0"]["linear"]["kernel"]),
        np.asarray(p2["extractor"]["seq0"]["linear"]["kernel"]))


def test_prefetcher_preserves_batch_stream():
    from mrn_tpu.data.prefetch import Prefetcher

    counter = iter(range(100))

    def get_batch():
        i = next(counter)
        return (np.full((2, 2), i), [f"l{i}"])

    pf = Prefetcher(get_batch, depth=2)
    got = [pf()[1][0] for _ in range(10)]
    pf.close()
    assert got == [f"l{i}" for i in range(10)]
