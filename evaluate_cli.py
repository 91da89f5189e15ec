"""Standalone evaluation CLI — the reference's test.py rebuilt
(reference: test.py:282-378, 460-495):

    python evaluate_cli.py --config configs/crnn_mrn.py \
        --saved_model saved_models/CRNN_MRN/Bangla_5_best_score.msgpack \
        --eval_data ../dataset/MLT17_IL/test_2017 [--taski 5]

Loads the cumulative dictionary from the train roots, rebuilds the model at
the checkpointed class count, and reports word accuracy + NED (and per-task
splits when multiple eval roots are given).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from mrn_tpu.codec import load_dict
from mrn_tpu.config import load_config
from mrn_tpu.data.manager import ValDataset
from mrn_tpu.train.learners import build_learner
from mrn_tpu.utils.logging import ExperimentLog


def main():
    # honor MRN_TPU_PLATFORM=cpu|tpu (the env JAX_PLATFORMS is consumed by the
    # site's TPU plugin bootstrap before user code runs)
    if os.environ.get("MRN_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["MRN_TPU_PLATFORM"])
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--saved_model", required=True)
    parser.add_argument("--eval_data", nargs="+", required=True,
                        help="test roots (per-language subdirs inside)")
    parser.add_argument("--taski", type=int, default=None,
                        help="evaluate tasks 0..taski (default: all)")
    args = parser.parse_args()

    opt = load_config(args.config, extra_sections=["test"])
    np.random.seed(opt.manual_seed)
    last_task = args.taski if args.taski is not None else len(opt.lan_list) - 1

    # cumulative character dict over tasks 0..last_task (tiny_train.py:264-269)
    char = {}
    for taski in range(last_task + 1):
        for data_path in opt.select_data:
            opt.character, char = load_dict(
                os.path.join(data_path, opt.lan_list[taski]), char)

    learner = build_learner(opt)
    learner._cur_task = last_task
    learner.character = opt.character
    learner.converter = learner.build_converter()
    if opt.il == "mrn":
        # the checkpoint carries the composite expert state
        learner.build_model()
    else:
        learner.build_model()

    from mrn_tpu.train.checkpoint import load_model
    payload = load_model(args.saved_model)
    learner.params = payload["params"]
    learner.batch_stats = payload["batch_stats"]
    if opt.il == "mrn":
        learner.expert_params = list(payload.get("experts", []))
        learner.expert_stats = list(payload.get("expert_stats", []))
        learner.router_params = payload.get("router") or None
        learner._phase = "standalone" if last_task == 0 else "routed"
        if last_task > 0:
            learner.class_counts = [
                e["fc"]["kernel"].shape[1] for e in learner.expert_params]
            learner._build_mrn_module(len(learner.expert_params),
                                      counts=tuple(learner.class_counts))

    from mrn_tpu.models.surgery import count_params
    n_params = count_params(learner.params)
    print(f"# parameters: {n_params / 1e6:.2f} M")

    scores, neds = [], []
    for root in args.eval_data:
        for taski in range(last_task + 1):
            val_data = os.path.join(root, opt.lan_list[taski])
            loader = ValDataset([val_data], opt).create_dataset()
            choose = "TF" if (opt.il == "mrn" and last_task > 0) else "test"
            res = learner.run_validation(loader, choose)
            scores.append(res.score)
            neds.append(res.ned or 0.0)
            print(f"{val_data}: acc={res.score:.2f} ned={res.ned or 0:.2f} "
                  f"infer_time={res.infer_time:.2f}s n={res.length_of_data}")
    print(f"total_accuracy: {sum(scores) / len(scores):.2f}")
    print(f"total_ned: {sum(neds) / len(neds):.2f}")


if __name__ == "__main__":
    main()
