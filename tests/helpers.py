"""Shared wiring for learner tests: tiny options + synthetic data plumbing."""

import numpy as np

from mrn_tpu.config import default_options
from mrn_tpu.data.manager import DatasetManager, ValDataset
from mrn_tpu.data.synthetic import SyntheticSource


def tiny_opt(**overrides):
    base = dict(
        exp_name="test_exp",
        il="base",
        memory=None,
        memory_num=8,
        imgW=64,
        output_channel=64,
        hidden_size=32,
        batch_size=8,
        num_iter=6,
        val_interval=3,
        batch_max_length=8,
        lan_list=["T0", "T1", "T2"],
        select_data=["synth_train"],
        valid_datas=["synth_test"],
        grad_clip=5,
        workers=0,
    )
    base.update(overrides)
    return default_options(**base)


def make_source(opt, n_train=48, n_test=12, seed=0):
    alphabets = ["abc", "def", "ghi"][: len(opt.lan_list)]
    return SyntheticSource(alphabets, opt.lan_list, n_train=n_train,
                           n_test=n_test, img_h=opt.imgH, img_w=opt.imgW,
                           seed=seed)


def make_manager(opt, source):
    return DatasetManager(opt, dataset_factory=source.train_factory)


def make_val(opt, source, upto_task):
    val_datas = [f"synth_test/{opt.lan_list[i]}" for i in range(upto_task + 1)]
    return ValDataset(val_datas, opt, dataset_factory=source.val_factory)


def run_tasks(learner, opt, source, n_tasks, out_dir):
    """Drives the tiny_train.py task loop (reference: tiny_train.py:195-294)."""
    manager = make_manager(opt, source)
    best_scores, ned_scores = [], []
    valid_datas = []
    for taski in range(n_tasks):
        valid_datas.append(f"synth_test/{opt.lan_list[taski]}")
        val_ds = make_val(opt, source, taski)
        if taski == 0:
            manager.init_start(opt, opt.select_data, None, taski)
        character = source.cumulative_character(taski)
        learner.incremental_train(taski, character, manager, val_ds)
        best_scores, ned_scores = learner.test(
            valid_datas, best_scores, ned_scores, taski,
            val_dataset_builder=lambda vd: ValDataset([vd], opt,
                dataset_factory=source.val_factory).create_dataset())
        learner.after_task()
    return best_scores, ned_scores
