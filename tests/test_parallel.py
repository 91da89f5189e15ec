import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrn_tpu.parallel.mesh import get_mesh, replicate, set_data_parallel, shard_batch


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    set_data_parallel(1)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(tmp_path):
    """The same jitted CRNN train step must produce identical params whether
    the batch is sharded over 8 devices or runs on one (XLA inserts the grad
    all-reduce; numerics identical up to reduction order)."""
    from helpers import make_manager, make_source, make_val, tiny_opt
    from mrn_tpu.train.learners.base import BaseLearner

    results = {}
    for dp in (1, 8):
        opt = tiny_opt(num_iter=3, val_interval=3, batch_size=16,
                       output_dir=str(tmp_path / f"s{dp}"),
                       data_log=str(tmp_path / f"d{dp}.txt"))
        set_data_parallel(dp)
        source = make_source(opt)
        learner = BaseLearner(opt)
        manager = make_manager(opt, source)
        manager.init_start(opt, opt.select_data, None, 0)
        learner.incremental_train(0, source.cumulative_character(0), manager,
                                  make_val(opt, source, 0))
        results[dp] = np.asarray(learner.params["fc"]["kernel"])
    np.testing.assert_allclose(results[1], results[8], atol=2e-5)


@pytest.mark.slow
def test_expert_parallel_matches_replicated():
    """MRN routed logits on a 2-D (data x expert) mesh must equal the
    unsharded result — XLA partitions the vmapped expert stack over the
    'expert' axis and inserts the gathers for the router combine."""
    from mrn_tpu.models.mrn import MRNNet
    from mrn_tpu.parallel.mesh import (replicate, set_expert_parallel,
                                       shard_batch, shard_experts)

    net = MRNNet(n_experts=2, num_classes=12, class_counts=(8, 12),
                 prediction="CTC", feature_extraction="VGG",
                 sequence_modeling="None", output_channel=32, hidden_size=16,
                 num_fiducial=8, img_size=(32, 64))
    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 64, 4),
                              jnp.float32)
    variables = net.init({"params": rng, "droppath": rng}, image,
                         train=False, is_train=True)

    @jax.jit
    def fwd(variables, image):
        out = net.apply(variables, image, cross=True, train=False,
                        is_train=False)
        return out["logits"], out["index"]

    ref_logits, ref_index = jax.tree_util.tree_map(
        np.asarray, fwd(variables, image))

    mesh = set_expert_parallel(2)
    assert dict(mesh.shape) == {"data": 4, "expert": 2}
    sharded = dict(replicate(variables))
    sharded["params"] = dict(sharded["params"])
    sharded["params"]["experts"] = shard_experts(
        variables["params"]["experts"], 2)
    if "batch_stats" in variables:
        sharded["batch_stats"] = {"experts": shard_experts(
            variables["batch_stats"]["experts"], 2)}
    ep_logits, ep_index = jax.tree_util.tree_map(
        np.asarray, fwd(sharded, shard_batch(image)))

    np.testing.assert_allclose(ref_logits, ep_logits, atol=1e-5)
    np.testing.assert_allclose(ref_index, ep_index, atol=1e-5)


def test_shard_experts_non_divisible_replicates():
    """3 experts on a 2-wide expert axis can't split evenly -> replicated."""
    from mrn_tpu.parallel.mesh import set_expert_parallel, shard_experts

    set_expert_parallel(2)
    tree = {"w": jnp.ones((3, 4, 4)), "b": jnp.ones((4,))}
    placed = shard_experts(tree, 3)
    assert placed["w"].sharding.is_fully_replicated
    assert placed["b"].sharding.is_fully_replicated
    even = shard_experts({"w": jnp.ones((2, 4, 4))}, 2)
    assert not even["w"].sharding.is_fully_replicated


def test_shard_batch_layout():
    set_data_parallel(8)
    mesh = get_mesh()
    assert mesh is not None and mesh.shape == {"data": 8}
    x = shard_batch(jnp.zeros((16, 4)))
    # batch axis split across the 8 devices
    assert len(x.sharding.device_set) == 8
    p = replicate({"w": jnp.ones((3, 3))})
    assert len(p["w"].sharding.device_set) == 8
