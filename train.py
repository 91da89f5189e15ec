"""Training CLI — the reference's tiny_train.py driver rebuilt
(reference: tiny_train.py:195-294, 407-460):

    python train.py --config configs/crnn_mrn.py

Loads a reference-format config, seeds, then runs the incremental task loop:
per task build the data stream, grow the cumulative character dict from the
per-task dict.txt files, train the learner, evaluate all seen tasks on both
MLT17/MLT19 test roots, and report Average Incremental Accuracy.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from mrn_tpu.codec import load_dict
from mrn_tpu.config import load_config
from mrn_tpu.data.manager import DatasetManager, ValDataset
from mrn_tpu.parallel.mesh import set_data_parallel
from mrn_tpu.train.learners import build_learner
from mrn_tpu.utils.logging import ExperimentLog


def train(opt, log: ExperimentLog):
    learner = build_learner(opt)
    data_manager = DatasetManager(opt)
    best_scores, ned_scores = [], []
    valid_datas = []
    char = {}

    def val_builder(val_data):
        return ValDataset([val_data], opt).create_dataset()

    train_datasets = list(opt.lan_list)

    if opt.il in ("joint_loader", "joint_mix"):
        valid_datas = []
        for taski in range(len(train_datasets)):
            for val_root in opt.valid_datas:
                valid_datas.append(os.path.join(val_root, opt.lan_list[taski]))
            data_manager.joint_start(opt, opt.select_data, log, taski,
                                     len(train_datasets))
            for data_path in opt.select_data:
                opt.character, char = load_dict(
                    os.path.join(data_path, opt.lan_list[taski]), char)
        valid_loader = ValDataset(valid_datas, opt)
        best_scores, ned_scores = learner.incremental_train(
            0, opt.character, data_manager, valid_loader,
            valid_datas=valid_datas, val_dataset_builder=val_builder)
        best_scores, ned_scores = learner.test(
            valid_datas, best_scores, ned_scores, 0,
            val_dataset_builder=val_builder)
    else:
        for taski in range(len(train_datasets)):
            for val_root in opt.valid_datas:
                valid_datas.append(os.path.join(val_root, opt.lan_list[taski]))
            valid_loader = ValDataset(valid_datas, opt)
            if taski == 0:
                data_manager.init_start(opt, opt.select_data, log, taski)

            for data_path in opt.select_data:
                opt.character, char = load_dict(
                    os.path.join(data_path, opt.lan_list[taski]), char)

            learner.incremental_train(taski, opt.character, data_manager,
                                      valid_loader)
            best_scores, ned_scores = learner.test(
                valid_datas, best_scores, ned_scores, taski,
                val_dataset_builder=val_builder)
            learner.after_task()

    log.write_data_log(f"----------- {opt.exp_name} ------------\n")
    if len(opt.valid_datas) == 1:
        aia = sum(best_scores) / len(best_scores)
        print(f"ALL Average Incremental Accuracy: {aia:.2f}")
        log.write_data_log(f"ALL Average Acc: {aia:.2f} \n")
    elif len(opt.valid_datas) == 2:
        a17 = sum(best_scores) / len(best_scores)
        a19 = sum(ned_scores) / len(ned_scores)
        print(f"ALL Average 17 Acc: {a17:.2f}")
        print(f"ALL Average 19 Acc: {a19:.2f}")
        log.write_data_log(f"ALL 17 Acc: {a17:.2f} \n")
        log.write_data_log(f"ALL 19 Acc: {a19:.2f} \n")
    return best_scores, ned_scores


def main():
    # honor MRN_TPU_PLATFORM=cpu|tpu (the env JAX_PLATFORMS is consumed by the
    # site's TPU plugin bootstrap before user code runs)
    if os.environ.get("MRN_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["MRN_TPU_PLATFORM"])
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="reference-format python config file")
    parser.add_argument("--data_parallel", type=int, default=None,
                        help="shard the batch over this many devices")
    parser.add_argument("--expert_parallel", type=int, default=None,
                        help="shard MRN's stacked expert axis over this many "
                             "devices (2-D data x expert mesh)")
    parser.add_argument("--profile", default=None,
                        help="capture a jax.profiler trace to this directory")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision training: forward/backward in "
                             "bf16, f32 master params/optimizer/BN stats "
                             "(train_dtype='bf16' in configs)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() before mesh "
                             "setup (TPU pods auto-detect; otherwise set "
                             "JAX coordinator env vars)")
    parser.add_argument("--device_bank", action="store_true",
                        help="decode+resize each task's images ONCE into a "
                             "device-resident uint8 bank and stream only "
                             "int32 indices per step (for datasets that fit "
                             "in HBM; incompatible with Aug)")
    args = parser.parse_args()

    opt = load_config(args.config)
    random.seed(opt.manual_seed)
    np.random.seed(opt.manual_seed)
    if args.bf16:
        opt.train_dtype = "bf16"
    if args.multihost or opt.get("multihost", False):
        from mrn_tpu.parallel import multihost
        rank, count = multihost.initialize()
        print(f"multihost: process {rank}/{count}, "
              f"global devices: {len(__import__('jax').devices())}")
    if args.device_bank or opt.get("device_bank", False):
        from mrn_tpu.data.dataset import DeviceImageBank
        opt.image_bank = DeviceImageBank()

    expert_par = args.expert_parallel or opt.get("expert_parallel", 1)
    data_par = args.data_parallel or opt.get("data_parallel", 0)
    if expert_par and expert_par > 1:
        from mrn_tpu.parallel.mesh import set_expert_parallel
        set_expert_parallel(expert_par, data=data_par or None)
    elif data_par:
        set_data_parallel(data_par)

    log = ExperimentLog(opt.exp_name, opt.get("output_dir", "./saved_models"),
                        opt.get("data_log", "./data_any.txt"), echo=True)
    log.write_data_log(f"----------- {opt.exp_name} ------------\n")
    if args.profile:
        from mrn_tpu.utils.profiling import trace
        with trace(args.profile):
            train(opt, log)
    else:
        train(opt, log)


if __name__ == "__main__":
    main()
