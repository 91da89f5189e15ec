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


def test_shard_batch_layout():
    set_data_parallel(8)
    mesh = get_mesh()
    assert mesh is not None and mesh.shape == {"data": 8}
    x = shard_batch(jnp.zeros((16, 4)))
    # batch axis split across the 8 devices
    assert len(x.sharding.device_set) == 8
    p = replicate({"w": jnp.ones((3, 3))})
    assert len(p["w"].sharding.device_set) == 8
