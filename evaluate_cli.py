"""Standalone evaluation CLI — the reference's test.py rebuilt
(reference: test.py:24-136 ``benchmark_all_eval``, 282-378 ``test``,
381-509 argparse + model_name presets):

    # per-task IL evaluation (cumulative dict over tasks 0..taski)
    python evaluate_cli.py --config configs/crnn_mrn.py \
        --saved_model saved_models/CRNN_MRN/Bangla_5_best_score.msgpack \
        --eval_data ../dataset/MLT17_IL/test_2017 --taski 5

    # the reference's benchmark_all_eval presets
    python evaluate_cli.py --config configs/crnn_mrn.py \
        --saved_model ... --eval_type IL_STR [--calculate_infer_time]

Loads the cumulative dictionary from the train roots, rebuilds the model at
the checkpointed class count, and reports word accuracy + NED.  With
``--eval_type`` it reproduces the reference's preset dataset lists, the
``result/{exp}/log_all_evaluation.txt`` output, and the
``evaluation_log/log_{all_model,multiple_test}_*.txt`` convenience logs
field-for-field; ``--calculate_infer_time`` switches to batch_size=1 so the
reported time is per-image device inference time.
"""

from __future__ import annotations

import argparse
import os
from datetime import date

import numpy as np

from mrn_tpu.codec import load_dict
from mrn_tpu.config import load_config
from mrn_tpu.data.dataset import hierarchical_dataset
from mrn_tpu.data.manager import EpochLoader, ValDataset
from mrn_tpu.data.transform import build_transform
from mrn_tpu.train.learners import build_learner

# Preset evaluation dataset lists (reference test.py:26-54).
EVAL_TYPE_PRESETS = {
    "benchmark": (  # 6 benchmark evaluation datasets
        ["IIIT5k_3000", "SVT", "IC13_1015", "IC15_2077", "SVTP", "CUTE80"],
        "data_CVPR2021/evaluation/benchmark/",
    ),
    "addition": (  # 7 additionally collected evaluation datasets
        ["5.COCO", "6.RCTW17", "7.Uber", "8.ArT", "9.LSVT", "10.MLT19",
         "11.ReCTS"],
        "data_CVPR2021/evaluation/addition/",
    ),
    "IL_STR": (  # the paper's 8-language incremental MLT19 splits
        ["Latin", "Chinese", "Arabic", "Japanese", "Korean", "Bangla",
         "Hindi", "Symbols"],
        "../dataset/MLT2019/test_2019/",
    ),
}


def apply_model_name_presets(opt):
    """model_name → 4-stage architecture presets (reference test.py:476-492)."""
    name = opt.get("model_name")
    if name == "CRNN":
        opt.Transformation, opt.FeatureExtraction = "None", "VGG"
        opt.SequenceModeling, opt.Prediction = "BiLSTM", "CTC"
    elif name == "TRBA":
        opt.Transformation, opt.FeatureExtraction = "TPS", "ResNet"
        opt.SequenceModeling, opt.Prediction = "BiLSTM", "Attn"
    elif name == "RBA":
        opt.Transformation, opt.FeatureExtraction = "None", "ResNet"
        opt.SequenceModeling, opt.Prediction = "BiLSTM", "Attn"
    return opt


def load_learner(opt, saved_model: str, last_task: int):
    """Rebuild the learner at the checkpointed class count and load weights
    (reference test.py:282-331 model build + load_state_dict)."""
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
    learner.build_model()

    from mrn_tpu.train.checkpoint import load_model
    payload = load_model(saved_model)
    learner.params = payload["params"]
    learner.batch_stats = payload["batch_stats"]
    if opt.il == "mrn":
        # the checkpoint carries the composite expert state — inline, or as
        # content-addressed blob refs resolved next to the checkpoint file
        learner.restore_composite(
            payload,
            expert_dir=os.path.join(os.path.dirname(os.path.abspath(saved_model)),
                                    "experts"))
        learner._phase = "standalone" if last_task == 0 else "routed"
        if last_task > 0:
            learner.class_counts = [
                e["fc"]["kernel"].shape[1] for e in learner.expert_params]
            learner._build_mrn_module(len(learner.expert_params),
                                      counts=tuple(learner.class_counts))
    return learner


def _val_choose(opt, last_task: int) -> str:
    return "TF" if (opt.il == "mrn" and last_task > 0) else "test"


def quantize_learner_int8(learner, opt, calib_loader, n_batches: int = 4):
    """Post-training w8a8 eval (--int8): calibrate per-conv input ranges on a
    few batches, quantize conv kernels per-output-channel, and swap the
    learner's model to the int8 conv path (mrn_tpu.ops.int8).  The int8 MXU
    path is the ~2x lever on the compute-bound TRBA ResNet (21.5 GFLOP/img;
    the reference has no quantized path — pure fp32 torch)."""
    import jax.numpy as jnp
    from mrn_tpu.models.composer import build_recognizer
    from mrn_tpu.ops.int8 import quantize_variables

    calib = build_recognizer(opt, learner._total_classes, quant="calib")
    variables = {"params": learner.params, "batch_stats": learner.batch_stats}
    quant = None
    it = iter(calib_loader)
    for _ in range(n_batches):
        try:
            images = next(it)[0]  # (images, labels[, n_valid/idx])
        except StopIteration:
            break
        kw = {}
        if opt.Prediction == "Attn":
            kw["text"] = jnp.full((len(images), 1),
                                  getattr(learner.converter, "sos_id", 0),
                                  jnp.int32)
        v = dict(variables)
        if quant is not None:
            v["quant"] = quant
        _, upd = calib.apply(v, learner._device_images(images), train=False,
                             is_train=False, mutable=["quant"], **kw)
        quant = upd["quant"]
    if quant is None:
        raise ValueError("int8 calibration saw no batches — the calibration "
                         "loader is empty; quantizing without activation "
                         "ranges would produce garbage")
    qv = quantize_variables({**variables, "quant": quant})
    learner.model = build_recognizer(opt, learner._total_classes, quant="int8")
    learner.params = qv["params"]
    learner.eval_quant = qv["quant"]
    return learner


def check_svtr_envelope(learner, opt, loader):
    """One-time per-checkpoint calibration of the fused SVTR kernel's
    reduction-free-softmax score clamp (ADVICE r4): measure max |attention
    score| on one batch via the composed path and warn loudly if the loaded
    checkpoint is outside the envelope (models.svtr.score_envelope)."""
    import jax.numpy as jnp
    from mrn_tpu.models.svtr import score_envelope
    from mrn_tpu.ops.svtr_block import SCORE_CLAMP

    if (opt.FeatureExtraction != "SVTR"
            or getattr(learner, "eval_quant", None) is not None  # int8 path
            or getattr(learner, "_envelope_checked", False)):
        return
    learner._envelope_checked = True
    try:
        images = next(iter(loader))[0]
    except StopIteration:
        return
    variables = {"params": learner.params, "batch_stats": learner.batch_stats}
    kw = {}
    if opt.Prediction == "Attn":
        kw = dict(text=jnp.full((len(images), 1),
                                getattr(learner.converter, "sos_id", 0),
                                jnp.int32), is_train=False)
    mx = score_envelope(learner.model, variables,
                        learner._device_images(images), train=False, **kw)
    print(f"# svtr score envelope: max |score| {mx:.1f} "
          f"(fused-kernel clamp {SCORE_CLAMP:g})")


def benchmark_all_eval(learner, opt, last_task: int,
                       calculate_infer_time: bool = False,
                       log_multiple_test: bool = False,
                       result_dir: str = "./result",
                       evaluation_log_dir: str = "./evaluation_log",
                       eval_data_list=None):
    """Evaluate the preset dataset list and write the reference's log files
    field-for-field (reference test.py:24-136).  ``eval_data_list`` overrides
    the preset sub-directory names (tests use synthetic task dirs)."""
    preset_list, default_root = EVAL_TYPE_PRESETS[opt.eval_type]
    eval_data_list = eval_data_list or preset_list
    eval_root = opt.get("eval_data") or default_root

    # batch_size 1 to measure the device inference time per image (test.py:56-61)
    eval_batch_size = 1 if calculate_infer_time else opt.batch_size

    exp_dir = os.path.join(result_dir, opt.exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    os.makedirs(evaluation_log_dir, exist_ok=True)

    transform = build_transform(opt, mode="test")
    choose = _val_choose(opt, last_task)

    accuracy_list = []
    total_forward_time = 0.0
    total_eval_data_number = 0
    total_correct_number = 0.0
    log = open(os.path.join(exp_dir, "log_all_evaluation.txt"), "a",
               encoding="utf-8")
    dashed_line = "-" * 80
    print(dashed_line)
    log.write(dashed_line + "\n")
    for eval_data in eval_data_list:
        eval_data_path = eval_root + eval_data
        ds, eval_data_log = hierarchical_dataset(root=eval_data_path, opt=opt,
                                                 mode="test")
        bank = opt.get("image_bank")
        if bank is not None:
            from mrn_tpu.data.dataset import bank_dataset
            ds = bank.datasets.get(eval_data_path) or bank.datasets.setdefault(
                eval_data_path, bank_dataset(ds, opt, bank))
        loader = EpochLoader(ds, eval_batch_size, transform, shuffle=False,
                             pad_to_batch=True,
                             rng=np.random.default_rng(opt.manual_seed))
        check_svtr_envelope(learner, opt, loader)
        res = learner.run_validation(loader, choose)

        accuracy_list.append(f"{res.score:0.2f}")
        total_forward_time += res.infer_time
        total_eval_data_number += len(ds)
        total_correct_number += res.score * res.length_of_data
        log.write(eval_data_log)
        print(f"Acc {res.score:0.2f}")
        log.write(f"Acc {res.score:0.2f}\n")
        print(f"Ned {res.ned or 0:0.2f}")
        log.write(f"Ned {res.ned or 0:0.2f}\n")
        print(dashed_line)
        log.write(dashed_line + "\n")

    averaged_forward_time = total_forward_time / total_eval_data_number * 1000
    total_accuracy = total_correct_number / total_eval_data_number
    from mrn_tpu.models.surgery import count_params
    params_num = count_params(learner.params)

    eval_log = "accuracy: "
    for name, accuracy in zip(eval_data_list, accuracy_list):
        eval_log += f"{name}: {accuracy}\t"
    eval_log += f"total_accuracy: {total_accuracy:0.2f}\t"
    eval_log += (f"averaged_infer_time: {averaged_forward_time:0.3f}\t"
                 f"# parameters: {params_num / 1e6:0.2f}")
    print(eval_log)
    log.write(eval_log + "\n")

    # for convenience (test.py:114-134)
    print("\t".join(accuracy_list))
    print(f"Total_accuracy:{total_accuracy:0.2f}")
    log.write("\t".join(accuracy_list) + "\n")
    log.write(f"Total_accuracy:{total_accuracy:0.2f}" + "\n")
    log.close()

    today = date.today()
    if log_multiple_test:
        with open(os.path.join(evaluation_log_dir,
                               f"log_multiple_test_{today}.txt"), "a",
                  encoding="utf-8") as log_all_model:
            log_all_model.write("\t".join(accuracy_list) + "\n")
    else:
        with open(os.path.join(evaluation_log_dir,
                               f"log_all_model_evaluation_{today}.txt"), "a",
                  encoding="utf-8") as log_all_model:
            log_all_model.write(
                f"{result_dir}/{opt.exp_name}\t"
                f"Total_accuracy:{total_accuracy:0.2f}\n")
            log_all_model.write("\t".join(accuracy_list) + "\n")

    return total_accuracy, eval_data_list, accuracy_list


def evaluate_tasks(learner, opt, eval_roots, last_task: int,
                   result_dir: str = "./result"):
    """Per-task cumulative evaluation over explicit roots, plus the
    reference's single-dataset result log (test.py:356-378)."""
    exp_dir = os.path.join(result_dir, opt.exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    log = open(os.path.join(exp_dir, "log_evaluation.txt"), "a",
               encoding="utf-8")
    choose = _val_choose(opt, last_task)
    scores, neds = [], []
    for root in eval_roots:
        for taski in range(last_task + 1):
            val_data = os.path.join(root, opt.lan_list[taski])
            # build the eval set ONCE (ValDataset handles device-bank reuse);
            # emit the hierarchical_dataset-format log line from its size
            loader = ValDataset([val_data], opt).create_dataset()
            eval_data_log = (
                f"dataset_root:  {val_data}\t dataset: /\n"
                f"sub-directory:\t/.\t num samples: {len(loader.dataset)}\n")
            check_svtr_envelope(learner, opt, loader)
            res = learner.run_validation(loader, choose)
            scores.append(res.score)
            neds.append(res.ned or 0.0)
            log.write(eval_data_log)
            log.write(f"best acc score{res.score:0.2f}\n")
            log.write(f"best ned score{res.ned or 0:0.2f}\n")
            print(f"{val_data}: acc={res.score:.2f} ned={res.ned or 0:.2f} "
                  f"infer_time={res.infer_time:.2f}s n={res.length_of_data}")
    print(f"total_accuracy: {sum(scores) / len(scores):.2f}")
    print(f"total_ned: {sum(neds) / len(neds):.2f}")
    log.close()
    return scores, neds


def main():
    # honor MRN_TPU_PLATFORM=cpu|tpu (the env JAX_PLATFORMS is consumed by the
    # site's TPU plugin bootstrap before user code runs)
    if os.environ.get("MRN_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["MRN_TPU_PLATFORM"])
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--saved_model", required=True)
    parser.add_argument("--eval_data", nargs="+", default=None,
                        help="test roots (per-language subdirs inside); with "
                             "--eval_type the first entry overrides the "
                             "preset root")
    parser.add_argument("--taski", type=int, default=None,
                        help="evaluate tasks 0..taski (default: all)")
    parser.add_argument("--eval_type", choices=sorted(EVAL_TYPE_PRESETS),
                        default=None,
                        help="preset dataset list: 6 benchmark / 7 addition / "
                             "8 IL_STR languages (reference test.py:26-54)")
    parser.add_argument("--calculate_infer_time", action="store_true",
                        help="batch_size=1 to measure per-image infer time")
    parser.add_argument("--log_multiple_test", action="store_true")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--model_name", choices=["CRNN", "TRBA", "RBA"],
                        default=None, help="architecture preset override")
    parser.add_argument("--result_dir", default="./result")
    parser.add_argument("--evaluation_log_dir", default="./evaluation_log")
    parser.add_argument("--device_bank", action="store_true",
                        help="decode+resize eval sets once into a "
                             "device-resident uint8 bank (indices-only "
                             "host->device traffic)")
    parser.add_argument("--int8", action="store_true",
                        help="post-training w8a8 path (VGG/ResNet convs and "
                             "SVTR block projections; calibrated on the "
                             "first eval batches) — the int8 MXU is ~2x "
                             "bf16 on the compute-bound matmuls")
    args = parser.parse_args()

    opt = load_config(args.config, extra_sections=["test"])
    if args.model_name:
        opt.model_name = args.model_name
        apply_model_name_presets(opt)
    elif "model_name" in opt.get("explicit_keys", ()):
        # The reference maps model_name -> stage presets only when cfg.test
        # names one (test.py:476-492); the built-in default ("CRNN") must
        # not stomp a config's explicitly configured stages (e.g. SVTR).
        apply_model_name_presets(opt)
    if args.batch_size:
        opt.batch_size = args.batch_size
    if args.device_bank or opt.get("device_bank", False):
        from mrn_tpu.data.dataset import DeviceImageBank
        opt.image_bank = DeviceImageBank()
    np.random.seed(opt.manual_seed)
    last_task = args.taski if args.taski is not None else len(opt.lan_list) - 1

    learner = load_learner(opt, args.saved_model, last_task)

    if args.int8:
        if opt.il in ("mrn", "der") and last_task > 0:
            parser.error("--int8 supports single-recognizer models (the "
                         "composite MRN/DER eval paths stay bf16)")
        if args.eval_data:
            calib_root = args.eval_data[0]
        elif args.eval_type in EVAL_TYPE_PRESETS:
            calib_root = EVAL_TYPE_PRESETS[args.eval_type][1]
        else:
            parser.error("--int8 needs calibration data: pass --eval_data "
                         "or a known --eval_type")
        calib_dir = os.path.join(calib_root, opt.lan_list[0])
        calib_loader = ValDataset([calib_dir], opt).create_dataset()
        quantize_learner_int8(learner, opt, calib_loader)
        print("# int8: quantized w8a8 (per-channel weights; conv "
              "extractors + SVTR block projections)")

    from mrn_tpu.models.surgery import count_params
    n_params = count_params(learner.params)
    print(f"# parameters: {n_params / 1e6:.2f} M")

    if args.eval_type:
        opt.eval_type = args.eval_type
        if args.eval_data:
            opt.eval_data = args.eval_data[0]
        benchmark_all_eval(learner, opt, last_task,
                           calculate_infer_time=args.calculate_infer_time,
                           log_multiple_test=args.log_multiple_test,
                           result_dir=args.result_dir,
                           evaluation_log_dir=args.evaluation_log_dir)
    else:
        if not args.eval_data:
            parser.error("--eval_data is required without --eval_type")
        evaluate_tasks(learner, opt, args.eval_data, last_task,
                       result_dir=args.result_dir)


if __name__ == "__main__":
    main()
