"""Run the UNMODIFIED torch reference (/root/reference/tiny_train.py) on the
exported synthetic LMDB suite — the system-level behavioral oracle
(VERDICT r2 #3): same task sequence, same data, same policies, reduced
dims/iters so it fits this host's single CPU core.

The reference's missing deps (lmdb/mmcv/timm/torchvision/natsort) are
satisfied by oracle/shims; torch.cuda is absent so the reference's
device-selection branch (il_modules/base.py:31) lands on CPU by itself.

    python oracle/run_reference.py --il base [--num_iter 300] [--tag r300]
    python oracle/run_reference.py --il mrn  ...

Artifacts land in oracle/runs/<il>_<tag>/ (saved_models/, data_any.txt,
stdout log).  Per-stage accuracy rows are parsed from the reference's own
log output by scripts/oracle_report.py.
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REFERENCE = "/root/reference"


def build_opt(args):
    data_root = os.path.join(HERE, args.data_root)
    opt = dict(
        # common (reference config/crnn_mrn.py:1-11)
        exp_name=f"oracle_{args.il}", il=args.il,
        memory="random" if args.il in ("mrn", "der", "wa") else None,
        memory_num=args.memory_num, batch_max_length=25,
        imgH=32, imgW=256, manual_seed=111, start_task=args.start_task,
        # model — reduced dims (single CPU core); MATCH these on the JAX side
        model_name="CRNN", Transformation="None", FeatureExtraction="VGG",
        SequenceModeling="BiLSTM", Prediction="CTC",
        num_fiducial=20, input_channel=4,
        output_channel=args.output_channel, hidden_size=args.hidden_size,
        # optimizer (reference crnn_mrn.py:29-41)
        schedule="super", optimizer="adam", lr=0.0005, sgd_momentum=0.9,
        sgd_weight_decay=0.000001, milestones=[2000, 4000], lrate_decay=0.1,
        rho=0.95, eps=1e-8, lr_drop_rate=0.1,
        # train (reference crnn_mrn.py:44-67) — single synthetic root
        saved_model="", Aug="None", workers=0,
        lan_list=["Chinese", "Latin", "Japanese", "Korean", "Arabic",
                  "Bangla"][:args.tasks],
        valid_datas=[os.path.join(data_root, "synth_test")],
        select_data=[os.path.join(data_root, "synth_train")],
        batch_ratio="0.5-0.5", total_data_usage_ratio="1.0", NED=True,
        batch_size=args.batch_size, num_iter=args.num_iter,
        val_interval=max(1, args.num_iter // 2), log_multiple_test=None,
        grad_clip=5,
    )
    return argparse.Namespace(**opt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--il", default="base")
    ap.add_argument("--num_iter", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--output_channel", type=int, default=128)
    ap.add_argument("--hidden_size", type=int, default=64)
    ap.add_argument("--memory_num", type=int, default=600)
    ap.add_argument("--tasks", type=int, default=6)
    ap.add_argument("--tag", default="r")
    # Resume an interrupted run: tasks < start_task load their saved best
    # checkpoints instead of training (reference il_modules/base.py:178-195;
    # mrn.py:187-203 adds per-step granularity).
    ap.add_argument("--start_task", type=int, default=0)
    # "data" = the disjoint-alphabet suite; "data_shared" = the overlap
    # suite (30 shared glyphs per task, scripts/export_oracle_lmdb --shared).
    ap.add_argument("--data_root", default="data")
    args = ap.parse_args()

    # shims first, then the reference tree
    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(0, REFERENCE)

    import random

    import numpy as np
    import torch

    torch.set_num_threads(1)
    # torch>=2 removed the py2-style .next() the reference calls
    # (data_manage.py:204); restore it as an alias — no behavior change.
    from torch.utils.data import dataloader as _dl
    for _cls in (_dl._SingleProcessDataLoaderIter,
                 _dl._MultiProcessingDataLoaderIter):
        if not hasattr(_cls, "next"):
            _cls.next = _cls.__next__
    run_dir = os.path.join(HERE, "runs", f"{args.il}_{args.tag}")
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)  # reference writes ./saved_models, ./data_any.txt
    os.makedirs("saved_models", exist_ok=True)

    opt = build_opt(args)
    random.seed(opt.manual_seed)
    np.random.seed(opt.manual_seed)
    torch.manual_seed(opt.manual_seed)

    import tiny_train  # /root/reference/tiny_train.py, unmodified

    # The reference EWC's Fisher loop uses a module-level num_iter=5000
    # constant (il_modules/ewc.py:25,134) regardless of opt.num_iter; at the
    # oracle's reduced budget that would be 16x the training itself.  Scale
    # it with the same num_iter//4 convention the rebuild campaign uses
    # (scripts/accuracy_campaign.py fisher_num_iter) so both sides match.
    if args.il == "ewc":
        import il_modules.ewc as _ewc
        _ewc.num_iter = max(1, args.num_iter // 4)

    os.makedirs(f"./saved_models/{opt.exp_name}", exist_ok=True)
    log = open(f"./saved_models/{opt.exp_name}/log_train.txt", "a")
    t0 = time.time()
    tiny_train.train(opt, log)
    print(f"oracle {args.il} done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
