import numpy as np
import pytest

from mrn_tpu.data.manager import ValDataset

from helpers import make_manager, make_source, make_val, run_tasks, tiny_opt


def _run(learner_cls, opt, tmp_path, n_tasks=2):
    source = make_source(opt)
    learner = learner_cls(opt)
    best, ned = run_tasks(learner, opt, source, n_tasks, tmp_path)
    assert len(best) == n_tasks
    for b in best:
        assert 0.0 <= b <= 100.0
    return learner, best


@pytest.mark.slow
def test_lwf(tmp_path):
    from mrn_tpu.train.learners.lwf import LwF
    opt = tiny_opt(il="lwf", num_iter=4, val_interval=2, lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    learner, _ = _run(LwF, opt, tmp_path)
    assert learner._old_params is not None


@pytest.mark.slow
def test_wa_aligns_weights(tmp_path):
    from mrn_tpu.train.learners.wa import WA
    opt = tiny_opt(il="wa", num_iter=4, val_interval=2, lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    learner, _ = _run(WA, opt, tmp_path)
    assert learner.taski == 1


@pytest.mark.slow
def test_ewc_builds_fisher(tmp_path):
    from mrn_tpu.train.learners.ewc import EWC
    opt = tiny_opt(il="ewc", num_iter=4, val_interval=2, lan_list=["T0", "T1"],
                   fisher_num_iter=2,
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    learner, _ = _run(EWC, opt, tmp_path)
    assert learner.fisher is not None
    import jax
    # fisher clamped at 1e-4
    for leaf in jax.tree_util.tree_leaves(learner.fisher):
        assert float(np.max(np.asarray(leaf))) <= 1e-4 + 1e-9


@pytest.mark.slow
def test_der_expands_and_freezes(tmp_path):
    from mrn_tpu.train.learners.der import DER
    opt = tiny_opt(il="der", memory="random", num_iter=4, val_interval=2,
                   lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = DER(opt)

    frozen_snapshots = {}
    orig_update = learner._update_representation

    def spy(start_iter, taski, train_loader, valid_loader):
        frozen_snapshots["before"] = np.asarray(
            learner.params["extractors"]["seq0"]["linear"]["kernel"][0]).copy()
        orig_update(start_iter, taski, train_loader, valid_loader)
        frozen_snapshots["after"] = np.asarray(
            learner.params["extractors"]["seq0"]["linear"]["kernel"][0]).copy()

    learner._update_representation = spy
    best, _ = run_tasks(learner, opt, source, 2, tmp_path)
    assert learner.n_experts == 2
    # first (frozen) extractor unchanged through task-1 training
    np.testing.assert_array_equal(frozen_snapshots["before"],
                                  frozen_snapshots["after"])


@pytest.mark.slow
def test_mrn_two_tasks(tmp_path, monkeypatch):
    from mrn_tpu.train.learners.mrn import MRN
    opt = tiny_opt(il="mrn", memory="random", memory_num=8, num_iter=4,
                   val_interval=2, lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = MRN(opt)
    # snapshot each expert's BN stats at the moment it is frozen
    import jax
    frozen_stats = {}
    orig_freeze = MRN._freeze_newest

    def spy(self):
        orig_freeze(self)
        frozen_stats[len(self.expert_params) - 1] = jax.tree_util.tree_map(
            lambda x: np.array(x), self.expert_stats[-1])
    monkeypatch.setattr(MRN, "_freeze_newest", spy)
    best, _ = run_tasks(learner, opt, source, 2, tmp_path)
    assert len(learner.expert_params) == 2
    assert learner.class_counts[0] < learner.class_counts[1]
    assert learner.router_params is not None
    # step-tagged checkpoints exist
    exp_dir = tmp_path / "s" / opt.exp_name
    assert (exp_dir / "T0_0_0_best_score.msgpack").exists()
    assert (exp_dir / "T1_1_0_best_score.msgpack").exists()
    assert (exp_dir / "T1_1_1_best_score.msgpack").exists()

    # mrn_pin_expert_stats (default): router training must leave every
    # frozen expert's BN running stats bit-identical to its freeze-time
    # snapshot (the reference drifts them, il_modules/mrn.py:401 — measured to
    # collapse final-stage accuracy; see scripts/router_diagnose2.py)
    assert set(frozen_stats) == {0, 1}
    for i, snap in frozen_stats.items():
        for a, b in zip(jax.tree_util.tree_leaves(learner.expert_stats[i]),
                        jax.tree_util.tree_leaves(snap)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_mix(tmp_path):
    from mrn_tpu.train.learners.joint import JointLearner
    opt = tiny_opt(il="joint_mix", num_iter=4, val_interval=2,
                   lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = JointLearner(opt)
    manager = make_manager(opt, source)
    for taski in range(2):
        manager.joint_start(opt, opt.select_data, None, taski, 2)
    valid_datas = [f"synth_test/{l}" for l in opt.lan_list]
    val_ds = ValDataset(valid_datas, opt, dataset_factory=source.val_factory)
    character = source.cumulative_character(1)

    def builder(vd):
        return ValDataset([vd], opt,
                          dataset_factory=source.val_factory).create_dataset()

    best, ned = learner.incremental_train(0, character, manager, val_ds,
                                          valid_datas=valid_datas,
                                          val_dataset_builder=builder)
    assert len(best) >= 1  # per-interval all-task evaluations happened


def test_joint_loader(tmp_path):
    """joint_loader: per-task loaders each batch_size//n_tasks, round-robin
    concatenated per step (reference data_manage.py:63-77)."""
    from mrn_tpu.train.learners.joint import JointLearner
    opt = tiny_opt(il="joint_loader", num_iter=4, val_interval=2,
                   lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = JointLearner(opt)
    manager = make_manager(opt, source)
    for taski in range(2):
        manager.joint_start(opt, opt.select_data, None, taski, 2)
    # per-task loaders, each batch_size // n_tasks
    assert len(manager.loaders) == 2
    assert all(ld.batch_size == opt.batch_size // 2 for ld in manager.loaders)
    im, lb = manager.get_batch()
    assert im.shape[0] == 2 * (opt.batch_size // 2)
    valid_datas = [f"synth_test/{l}" for l in opt.lan_list]
    val_ds = ValDataset(valid_datas, opt, dataset_factory=source.val_factory)
    character = source.cumulative_character(1)

    def builder(vd):
        return ValDataset([vd], opt,
                          dataset_factory=source.val_factory).create_dataset()

    best, ned = learner.incremental_train(0, character, manager, val_ds,
                                          valid_datas=valid_datas,
                                          val_dataset_builder=builder)
    assert len(best) >= 1


@pytest.mark.slow  # ~100s on the 1-core CI host (VERDICT r3 weak #6)
def test_der_mixed_mode_train_apply(tmp_path):
    """Reference model_eval_and_train (il_modules/der.py:38-43): during
    task>0 training the frozen experts forward in eval mode (running stats)
    and their stats never update; only the newest expert trains."""
    import jax
    import jax.numpy as jnp
    from mrn_tpu.train.learners.der import DER

    opt = tiny_opt(il="der", memory="random", lan_list=["T0", "T1"],
                   output_dir=str(tmp_path / "s"),
                   data_log=str(tmp_path / "d.txt"))
    learner = DER(opt)
    learner.character = list("abcdef")
    learner.converter = learner.build_converter()
    learner.build_model()
    learner._known_classes = learner._total_classes
    learner.change_model()
    assert learner.n_experts == 2

    # make running stats diverge from batch stats so eval-mode forward is
    # distinguishable from train-mode forward
    stats = dict(learner.batch_stats)
    stats["extractors"] = jax.tree_util.tree_map(
        lambda x: x + jnp.concatenate(
            [jnp.ones_like(x[:1]), jnp.zeros_like(x[1:])], axis=0),
        stats["extractors"])

    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(jax.random.PRNGKey(1),
                              (4, opt.imgH, opt.imgW, opt.input_channel))
    batch = {"image": image}

    out_mixed, new_stats = learner._apply_train(learner.params, stats, batch, rng)

    # naive all-train apply (the pre-fix behavior) must differ: the frozen
    # expert's perturbed running stats only enter in eval mode
    out_naive, _ = learner.model.apply(
        {"params": learner.params, "batch_stats": stats},
        image, train=True, mutable=["batch_stats"], rngs={"droppath": rng})
    assert not np.allclose(np.asarray(out_mixed["logits"]),
                           np.asarray(out_naive["logits"]), atol=1e-5)

    # frozen expert's stats pinned; newest expert's stats updated
    changed = []
    for (path, old), (_, new) in zip(
            jax.tree_util.tree_flatten_with_path(stats["extractors"])[0],
            jax.tree_util.tree_flatten_with_path(new_stats["extractors"])[0]):
        np.testing.assert_array_equal(np.asarray(old[0]), np.asarray(new[0]),
                                      err_msg=f"frozen stats drifted: {path}")
        changed.append(not np.array_equal(np.asarray(old[1]),
                                          np.asarray(new[1])))
    assert any(changed), "newest expert's BN stats never updated"

    # gradients do not reach frozen extractor slices even without the mask
    def scalar_loss(params):
        out, _ = learner._apply_train(params, stats, batch, rng)
        return jnp.sum(out["logits"] ** 2)

    grads = jax.grad(scalar_loss)(learner.params)
    for path, g in jax.tree_util.tree_flatten_with_path(
            grads["extractors"])[0]:
        assert float(jnp.abs(g[0]).max()) == 0.0, f"grad leaked: {path}"
        del path
