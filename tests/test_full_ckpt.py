"""Full-state checkpointing: kill mid-stage, resume, bitwise-identical
trajectory vs the uninterrupted run (SURVEY §5 / VERDICT r2 #5).

The snapshot captures params/batch_stats/opt_state (incl. the OneCycle
counter), the jax PRNG key, the numpy Generator, memory indices, best_score
and the manager generator's at-build state; resume replays the deterministic
task-start path, rewinds the manager generator, rebuilds the loaders and
skips the consumed index draws (reference has nothing comparable — its
checkpoints are weights-only, il_modules/base.py:328-332)."""

import numpy as np
import pytest
import jax

from mrn_tpu.train.learners.base import BaseLearner
from mrn_tpu.train.learners.mrn import MRN

from helpers import make_manager, make_source, make_val, run_tasks, tiny_opt


class _Crash(Exception):
    pass


def _crashing(learner, crash_after, routed_only=False):
    """Wrap get_train_step to raise after ``crash_after`` step calls
    (optionally counting only MRN's routed phase)."""
    orig_get = learner.get_train_step
    calls = {"n": 0}

    def crashing_get():
        step = orig_get()

        def wrapped(state, batch, rng, aux):
            if not routed_only or getattr(learner, "_phase", "") == "routed":
                calls["n"] += 1
                if calls["n"] > crash_after:
                    raise _Crash()
            return step(state, batch, rng, aux)

        return wrapped

    learner.get_train_step = crashing_get
    return learner


def _train_base_task0(opt, crash_after=None):
    source = make_source(opt)
    learner = BaseLearner(opt)
    if crash_after is not None:
        _crashing(learner, crash_after)
    manager = make_manager(opt, source)
    manager.init_start(opt, opt.select_data, None, 0)
    val_ds = make_val(opt, source, 0)
    try:
        learner.incremental_train(0, source.cumulative_character(0), manager,
                                  val_ds)
    except _Crash:
        pass
    return learner


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(jax.device_get(a))
    lb = jax.tree_util.tree_leaves(jax.device_get(b))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow  # ~45s on the 1-core CI host (VERDICT r3 weak #6)
def test_base_bitwise_resume(tmp_path):
    opts = dict(num_iter=8, val_interval=2, full_ckpt=True, lan_list=["T0"])
    opt_a = tiny_opt(output_dir=str(tmp_path / "a"),
                     data_log=str(tmp_path / "a.txt"), **opts)
    a = _train_base_task0(opt_a)

    opt_b = tiny_opt(output_dir=str(tmp_path / "b"),
                     data_log=str(tmp_path / "b.txt"), **opts)
    _train_base_task0(opt_b, crash_after=5)  # snapshots at 2 and 4; dies at 6
    ckpt = tmp_path / "b" / opt_b.exp_name / "T0_0_train_state.msgpack"
    assert ckpt.exists()

    b2 = _train_base_task0(opt_b.replace(resume_full=True))
    _assert_trees_equal(a.params, b2.params)
    _assert_trees_equal(a.batch_stats, b2.batch_stats)
    _assert_trees_equal(a.opt_state, b2.opt_state)
    assert not ckpt.exists()  # completed stage drops the rolling snapshot


@pytest.mark.slow
def test_mrn_router_bitwise_resume(tmp_path):
    opts = dict(il="mrn", memory="random", memory_num=8, num_iter=8,
                val_interval=2, full_ckpt=True, lan_list=["T0", "T1"])

    def drive(out, crash_after=None, resume=False, start_task=0):
        opt = tiny_opt(output_dir=str(tmp_path / out),
                       data_log=str(tmp_path / f"{out}.txt"),
                       resume_full=resume, start_task=start_task, **opts)
        source = make_source(opt)
        learner = MRN(opt)
        if crash_after is not None:
            _crashing(learner, crash_after, routed_only=True)
        try:
            run_tasks(learner, opt, source, 2, tmp_path)
        except _Crash:
            pass
        return learner

    a = drive("a")
    drive("b", crash_after=2)  # router loop: 4 iters, dies at routed step 3
    ckpt = tmp_path / "b" / "test_exp" / "T1_1_1_train_state.msgpack"
    assert ckpt.exists()

    # resume: coarse start_task replay to task-1 step-1, then the snapshot
    b2 = drive("b", resume=True, start_task=1.5)
    pa, sa = a._routed_params_for_eval()
    pb, sb = b2._routed_params_for_eval()
    _assert_trees_equal(pa, pb)
    _assert_trees_equal(sa, sb)


@pytest.mark.slow  # ~85s on the 1-core CI host (VERDICT r3 weak #6)
def test_ewc_fisher_recomputed_on_resume(tmp_path):
    """start_task resume rebuilds EWC's Fisher from the loaded checkpoint —
    the reference computes Fisher only at the _train tail (il_modules/
    ewc.py:47-57), so its resume silently trains later tasks without the
    penalty.  The rebuild's _after_resume hook repairs the state."""
    from mrn_tpu.train.learners.ewc import EWC

    opts = dict(il="ewc", num_iter=4, val_interval=4, fisher_num_iter=2,
                lan_list=["T0", "T1"])

    def drive(out, start_task=0):
        opt = tiny_opt(output_dir=str(tmp_path / out),
                       data_log=str(tmp_path / f"{out}.txt"),
                       start_task=start_task, **opts)
        source = make_source(opt)
        learner = EWC(opt)
        run_tasks(learner, opt, source, 2, tmp_path)
        return learner

    trained = drive("a")
    assert trained.fisher is not None
    resumed = drive("a", start_task=2)  # both tasks replayed from ckpts
    assert resumed.fisher is not None and resumed.mean is not None
    # blended over 2 tasks from checkpointed params — same tree structure
    assert (jax.tree_util.tree_structure(resumed.fisher)
            == jax.tree_util.tree_structure(trained.fisher))


@pytest.mark.slow
def test_mrn_best_ckpt_expert_dedup(tmp_path):
    """VERDICT r2 #9: best-score saves don't re-serialize frozen experts —
    they reference content-addressed blobs; reload reproduces the composite."""
    opt = tiny_opt(il="mrn", memory="random", memory_num=8, num_iter=4,
                   val_interval=2, lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "saved"),
                   data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = MRN(opt)
    run_tasks(learner, opt, source, 2, tmp_path)

    exp = tmp_path / "saved" / opt.exp_name
    blobs = list((exp / "experts").glob("*.msgpack"))
    assert len(blobs) == 2  # one per frozen expert, written once
    # the step-1 best checkpoint holds no inline expert stack
    import flax.serialization
    payload = flax.serialization.msgpack_restore(
        (exp / "T1_1_1_best_score.msgpack").read_bytes())
    assert "experts" not in payload["params"]
    assert "expert_refs" in payload
    # router best-save is small relative to the blobs it references
    assert (exp / "T1_1_1_best_score.msgpack").stat().st_size < \
        sum(b.stat().st_size for b in blobs)

    params_before, stats_before = learner._routed_params_for_eval()
    fresh = MRN(opt)
    fresh.character = learner.character
    fresh.converter = fresh.build_converter()
    fresh.class_counts = list(learner.class_counts)
    fresh._build_mrn_module(n_experts=2, counts=tuple(learner.class_counts))
    fresh._phase = "routed"
    fresh._load_best(1, step=1)
    params_after, stats_after = fresh._routed_params_for_eval()
    _assert_trees_equal(params_before, params_after)
    _assert_trees_equal(stats_before, stats_after)
