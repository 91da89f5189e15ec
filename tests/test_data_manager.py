import numpy as np
import pytest

from mrn_tpu.data.manager import DatasetManager

from helpers import make_source, tiny_opt


def _manager_after_memory(opt, taski=2):
    source = make_source(opt, n_train=40)
    m = DatasetManager(opt, dataset_factory=source.train_factory)
    m.select_data = opt.select_data
    index_list = [np.arange(4), np.arange(4)][:taski]
    m.get_dataset(taski, memory="random", index_list=index_list)
    return m


def test_mrn_reference_router_labels_are_binary():
    opt = tiny_opt(il="mrn", memory="random", memory_num=8)
    m = _manager_after_memory(opt)
    images, labels, idxs = m.get_batch2()
    assert set(np.unique(idxs)).issubset({0, 1})  # memory vs current


def test_mrn_task_router_labels():
    opt = tiny_opt(il="mrn", memory="random", memory_num=8,
                   router_labels="task")
    m = _manager_after_memory(opt, taski=2)
    seen = set()
    for _ in range(8):
        _, _, idxs = m.get_batch2()
        seen.update(np.unique(idxs).tolist())
    assert seen.issubset({0, 1, 2})
    assert 2 in seen  # current-task label present


def test_default_memory_policy_half_batches():
    opt = tiny_opt(il="lwf", memory="random", memory_num=8, batch_size=8)
    source = make_source(opt, n_train=40)
    m = DatasetManager(opt, dataset_factory=source.train_factory)
    m.select_data = opt.select_data
    m.get_dataset(1, memory="random", index_list=[np.arange(4)])
    images, labels = m.get_batch()
    # two half-batch loaders concatenated (data_manage.py:55-58)
    assert images.shape[0] == 8
    assert len(m.loaders) == 2
    assert m.loaders[0].batch_size == 4


def test_repeat_to_50k():
    opt = tiny_opt()
    source = make_source(opt, n_train=10)
    m = DatasetManager(opt, dataset_factory=source.train_factory)
    m.select_data = opt.select_data
    ds = m.create_dataset(data_list=opt.select_data, taski=0)
    assert len(ds) == 10 * int(50000 / 10)


@pytest.mark.parametrize("policy", ["test_ch", "large", "total"])
def test_mix_memory_policies(policy):
    """The reference's three mix policies (data_manage.py:30-54) as USABLE
    single-loader streams (there they only work under il=mrn's shadowing
    branch; get_batch drops 3-tuple mix loaders via except-ValueError)."""
    opt = tiny_opt(il="lwf", memory=policy, memory_num=4, batch_size=8)
    source = make_source(opt, n_train=40)
    m = DatasetManager(opt, dataset_factory=source.train_factory)
    m.select_data = opt.select_data
    m.get_dataset(1, memory=policy, index_list=[np.arange(4)])
    assert len(m.loaders) == 1
    assert m.loaders[0].batch_size == 8
    images, labels = m.get_batch()
    assert images.shape[0] == 8
    assert len(labels) == 8
