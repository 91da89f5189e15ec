"""6-task synthetic AIA campaign — the accuracy-protocol proxy for the MLT17
incremental benchmark, runnable in this environment (the MLT17/19 LMDBs are
not available here).

Echoes the reference benchmark's shape (README.md:98-100) at FULL instance
scale: 6 tasks in the reference order with the reference's per-task class
counts (1895/325/1620/1124/73/112 — disjoint CJK-like unicode spans) and
per-task instance counts, batch 256, Adam 5e-4 + OneCycle, grad clip 5, seed
111, 32x256 RGBA crops.  Words are rendered with the 16-bit block-pattern
encoder over GLOBAL class indices, so task identity is readable from the image
(as scripts are in real MLT); characters follow a Zipf(1.0) frequency law and
lengths skew short (p(L)~1/L), matching real scene text.

Protocol: per task, train; then reload the best checkpoint and evaluate ALL
seen tasks (il_modules/base.py:363-436); record the full accuracy matrix,
per-stage AIA, and final forgetting.

    python scripts/accuracy_campaign.py --il all [--num_iter 2500] \
        [--out ACCURACY_RUNS]

``--il all`` runs every strategy in ONE process, so the 2.6GB device-resident
image bank uploads once (the dominant fixed cost over a tunneled backend).
Writes <out>/<il>.json per strategy; scripts/accuracy_report.py assembles
ACCURACY.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrn_tpu.config import default_options
from mrn_tpu.data.manager import DatasetManager, ValDataset
from mrn_tpu.data.synthetic import SyntheticSource, alphabet_of_size
from mrn_tpu.train.learners import build_learner
from mrn_tpu.utils.logging import ExperimentLog

# MLT17 shape at FULL instance scale (reference README.md:98-100).  Characters
# are drawn Zipf(1.0) over each task alphabet and word lengths skew short
# (p(L)~1/L), matching real scene text: with uniform sampling the 1895-class
# Chinese task is unlearnable at MLT17's 2687 instances, while the real
# dataset (Zipfian char frequencies, shared glyph structure) is not.
LANS = ["Chinese", "Latin", "Japanese", "Korean", "Arabic", "Bangla"]
CLASSES = [1895, 325, 1620, 1124, 73, 112]
N_TRAIN = [2687, 47411, 4609, 5631, 3711, 3237]
N_TEST = [529, 11073, 1350, 1230, 983, 713]

ALL_ILS = ["base", "ewc", "lwf", "wa", "der", "mrn", "joint_mix"]

# memory policy mirrors the shipped configs: rehearsal methods use it
MEMORY_ILS = {"mrn", "der", "wa", "joint_mix"}


GEN_PARAMS = dict(min_len=1, max_len=10, renderer="bits", zipf=1.0,
                  classes=CLASSES, n_test=N_TEST)


def build_source(opt, seed=111, cache_dir=None, shared=0):
    """``shared`` > 0 prepends a shared glyph slice (the digits/punctuation
    analogue — real MLT scripts share Latin digits, reference
    README.md:94-103) to EVERY task alphabet, drawn from a span disjoint from
    all task spans.  With the Zipf character law the shared slice occupies
    the top frequency ranks, so shared glyphs dominate words like digits do
    in scene text — the cross-task overlap that makes EWC/LwF retention
    measurable (VERDICT r2 #4)."""
    spans, start = [], 0x4E00
    for n in CLASSES:
        spans.append(alphabet_of_size(n, start))
        start += n
    if shared:
        shared_slice = alphabet_of_size(shared, 0x3000)
        spans = [shared_slice + s for s in spans]
    cache = None
    if cache_dir:
        # the tag hashes every generation parameter, so editing the suite
        # definition above invalidates the cache instead of silently serving
        # stale data
        import hashlib
        params = dict(GEN_PARAMS, shared=shared) if shared else GEN_PARAMS
        h = hashlib.sha1(json.dumps(params, sort_keys=True)
                         .encode()).hexdigest()[:8]
        tag = f"s{seed}_n{sum(N_TRAIN)}_{opt.imgH}x{opt.imgW}_{h}"
        cache = os.path.join(cache_dir, f"suite_{tag}")
    if cache and os.path.exists(cache + ".npz"):
        t0 = time.time()
        source = SyntheticSource.load(cache + ".npz", LANS, spans)
        print(f"suite loaded from cache in {time.time() - t0:.0f}s", flush=True)
        return source
    gen = {k: v for k, v in GEN_PARAMS.items() if k != "classes"}
    source = SyntheticSource(spans, LANS, n_train=N_TRAIN,
                             img_h=opt.imgH, img_w=opt.imgW, seed=seed,
                             device_bank=True, **gen)
    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        source.save(cache + ".npz")
    return source


def _val_builder(opt, source):
    def build(val_data):
        return ValDataset([val_data], opt,
                          dataset_factory=source.val_factory).create_dataset()
    return build


def _matrix_row(learner, opt, source, taski):
    """Accuracy over tasks 0..taski with the already-loaded best checkpoint
    (learner.test just reloaded it)."""
    if opt.il == "mrn":
        choose = "FF" if taski == 0 else "TF"
    else:
        choose = "test"
    row = []
    for j in range(taski + 1):
        loader = _val_builder(opt, source)(f"synth_test/{opt.lan_list[j]}")
        res = learner.run_validation(loader, choose)
        row.append(round(res.score, 2))
    return row


def run_incremental(opt, source, log):
    learner = build_learner(opt)
    manager = DatasetManager(opt, dataset_factory=source.train_factory)
    best_scores, ned_scores = [], []
    valid_datas = []
    matrix, stage_times = [], []
    stop_after = opt.get("stop_after", -1)
    for taski in range(len(opt.lan_list)):
        t0 = time.time()
        valid_datas.append(f"synth_test/{opt.lan_list[taski]}")
        val_ds = ValDataset(valid_datas, opt,
                            dataset_factory=source.val_factory)
        if taski == 0:
            manager.init_start(opt, opt.select_data, log, taski)
        character = source.cumulative_character(taski)
        learner.incremental_train(taski, character, manager, val_ds)
        if taski < opt.get("eval_from", 0):
            # checkpoint-resumed stage whose row is already recorded: skip
            # the pure-reporting evals, keep the state accumulation
            learner.after_task()
            stage_times.append(round(time.time() - t0, 1))
            print(f"[{opt.il}] task {taski} ({opt.lan_list[taski]}): "
                  f"resumed, eval skipped ({stage_times[-1]}s)", flush=True)
            continue
        best_scores, ned_scores = learner.test(
            valid_datas, best_scores, ned_scores, taski,
            val_dataset_builder=_val_builder(opt, source))
        matrix.append(_matrix_row(learner, opt, source, taski))
        learner.after_task()
        stage_times.append(round(time.time() - t0, 1))
        print(f"[{opt.il}] task {taski} ({opt.lan_list[taski]}): "
              f"row={matrix[-1]} AIA={best_scores[-1]} "
              f"({stage_times[-1]}s)", flush=True)
        if stop_after >= 0 and taski >= stop_after:
            # per-stage process recycling (scripts/campaign_recycle.py):
            # exit after this stage; a fresh process resumes via
            # --start_task/--eval_from, sidestepping the tunneled TPU
            # client's host-RSS growth that OOM-killed 6-task campaigns
            print(f"[{opt.il}] stop_after={stop_after}: stage complete, "
                  "exiting for process recycle", flush=True)
            break
    return learner, best_scores, matrix, stage_times


def run_joint(opt, source, log):
    """The joint upper bound (train.py:40-56 flow)."""
    learner = build_learner(opt)
    manager = DatasetManager(opt, dataset_factory=source.train_factory)
    valid_datas = []
    n_tasks = len(opt.lan_list)
    t0 = time.time()
    for taski in range(n_tasks):
        valid_datas.append(f"synth_test/{opt.lan_list[taski]}")
        manager.joint_start(opt, opt.select_data, log, taski, n_tasks)
    character = source.cumulative_character(n_tasks - 1)
    val_ds = ValDataset(valid_datas, opt, dataset_factory=source.val_factory)
    best_scores, ned_scores = learner.incremental_train(
        0, character, manager, val_ds, valid_datas=valid_datas,
        val_dataset_builder=_val_builder(opt, source))
    best_scores, ned_scores = learner.test(
        valid_datas, best_scores or [], ned_scores or [], 0,
        val_dataset_builder=_val_builder(opt, source))
    row = _matrix_row(learner, opt, source, n_tasks - 1)
    print(f"[{opt.il}] joint row={row} ({time.time() - t0:.0f}s)", flush=True)
    return learner, [round(sum(row) / len(row), 2)], [row], \
        [round(time.time() - t0, 1)]


def run_strategy(il, args, source, memory_num, model_dims):
    prefix = "" if args.arch == "crnn" else f"{args.arch}_"
    opt = default_options(
        exp_name=f"acc_{prefix}{il}", il=il,
        memory="random" if il in MEMORY_ILS else None,
        memory_num=memory_num,
        batch_size=args.batch_size, num_iter=args.num_iter,
        val_interval=max(1, args.num_iter // 2),
        batch_max_length=25, imgH=32, imgW=256,
        lan_list=LANS[:args.tasks], select_data=["synth_train"],
        **model_dims,
        valid_datas=["synth_test"], workers=0, NED=True,
        manual_seed=args.seed,
        fisher_num_iter=max(1, args.num_iter // 4),  # EWC budget, scaled
        train_dtype="bf16" if args.bf16 else None,
        start_task=args.start_task, eval_from=args.eval_from,
        stop_after=args.stop_after,
        output_dir=os.path.join(args.out, "saved"),
        data_log=os.path.join(args.out, f"data_{prefix}{il}.txt"))
    opt.image_bank = source.device_bank()
    log = ExperimentLog(opt.exp_name, opt.output_dir, opt.data_log, echo=False)

    t0 = time.time()
    if il in ("joint_mix", "joint_loader"):
        learner, aia, matrix, times = run_joint(opt, source, log)
    else:
        learner, aia, matrix, times = run_incremental(opt, source, log)

    if args.stop_after >= 0:
        # recycled-process partial record: only the stages this process
        # actually evaluated (>= eval_from); campaign_recycle.py merges the
        # per-stage files into the final <prefix><il>.json
        partial = {
            "stage": args.stop_after, "eval_from": args.eval_from,
            "rows": matrix, "aia": aia,
            "stage_seconds": times,
            "total_seconds": round(time.time() - t0, 1),
        }
        path = os.path.join(args.out,
                            f"{prefix}{il}.stage{args.stop_after}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(partial, f, indent=1)
        print(f"wrote {path}", flush=True)
        return

    final_row = matrix[-1]
    # average forgetting: best-seen (diagonal) minus final, over tasks 0..n-2
    if len(matrix) != len(final_row):
        forgetting = None  # partial matrix (eval_from resume) — merge offline
    elif len(matrix) > 1:
        forgetting = round(sum(matrix[j][j] - final_row[j]
                               for j in range(len(final_row) - 1))
                           / (len(final_row) - 1), 2)
    else:
        forgetting = 0.0
    result = {
        "il": il, "num_iter": args.num_iter,
        "train_dtype": "bf16" if args.bf16 else "f32",
        "batch_size": args.batch_size, "seed": args.seed,
        "classes": CLASSES, "n_train": N_TRAIN, "n_test": N_TEST,
        "shared_glyphs": args.shared,
        "aia_per_stage": aia, "final_aia": aia[-1],
        "acc_matrix": matrix, "final_row": final_row,
        "avg_forgetting": forgetting,
        "stage_seconds": times, "total_seconds": round(time.time() - t0, 1),
    }
    result["arch"] = args.arch
    path = os.path.join(args.out, f"{prefix}{il}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("il", "final_aia", "avg_forgetting", "final_row",
                       "total_seconds")}), flush=True)
    print(f"wrote {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--il", required=True,
                    help="one of base/ewc/lwf/wa/der/mrn/joint_mix/"
                         "joint_loader, a comma list, or 'all'")
    ap.add_argument("--num_iter", type=int, default=2500)  # 10000/4
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--out", default="ACCURACY_RUNS")
    ap.add_argument("--seed", type=int, default=111)
    ap.add_argument("--platform", default=None, help="cpu to force CPU")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model dims + 1/80 data (wiring check only)")
    ap.add_argument("--tasks", type=int, default=6,
                    help="run only the first N tasks (pilots)")
    ap.add_argument("--skip_done", action="store_true",
                    help="skip strategies whose <out>/<il>.json exists")
    ap.add_argument("--start_task", type=float, default=0,
                    help="reference start_task resume: tasks (and MRN "
                         "half-steps — e.g. 5.5 resumes task 5's step 0 "
                         "and retrains its router step) below this load "
                         "their saved best checkpoint from <out>/saved/"
                         "<exp> instead of training (crash recovery)")
    ap.add_argument("--eval_from", type=int, default=0,
                    help="with --start_task resume: skip the per-stage evals "
                         "for tasks below this (their rows are already "
                         "recorded), evaluating only the later stages")
    ap.add_argument("--stop_after", type=int, default=-1,
                    help="exit after this stage completes (train + eval + "
                         "after_task), writing <prefix><il>.stage<K>.json — "
                         "the per-stage unit campaign_recycle.py drives in "
                         "a fresh process each to sidestep host-RSS growth")
    ap.add_argument("--shared", type=int, default=0,
                    help="size of the shared glyph slice prepended to every "
                         "task alphabet (the digits/punctuation analogue; "
                         "makes EWC/LwF retention measurable).  Use a "
                         "separate --out dir for overlap-suite runs")
    ap.add_argument("--arch", default="crnn",
                    choices=["crnn", "trba", "svtr"],
                    help="recognizer architecture (reference config/"
                         "{crnn,trba,svtr}_mrn.py stage strings); results "
                         "land in <out>/<arch>_<il>.json for non-crnn")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training (bf16 compute, f32 master "
                         "params/opt state/BN stats) — needed to fit DER's "
                         "5-6 stacked 512-ch extractors and the MRN ensemble "
                         "in single-chip HBM next to the image bank")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    global N_TRAIN, N_TEST
    model_dims = dict(output_channel=512, hidden_size=256)
    if args.arch == "trba":   # reference config/trba_mrn.py:16-20
        model_dims.update(Transformation="TPS", FeatureExtraction="ResNet",
                          SequenceModeling="BiLSTM", Prediction="Attn",
                          num_fiducial=20)
    elif args.arch == "svtr":  # reference config/svtr_mrn.py:16-26
        model_dims.update(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC")
    memory_num = 2000                                  # reference crnn_mrn.py
    if args.smoke:
        model_dims = dict(output_channel=64, hidden_size=32)
        N_TRAIN = [max(8, n // 80) for n in N_TRAIN]
        N_TEST = [max(8, n // 80) for n in N_TEST]
        memory_num = 16  # must stay below the smallest smoke task size

    ils = ALL_ILS if args.il == "all" else args.il.split(",")

    os.makedirs(args.out, exist_ok=True)
    opt_shape = default_options(imgH=32, imgW=256)
    t_build = time.time()
    source = build_source(opt_shape, seed=args.seed,
                          cache_dir=None if args.smoke else args.out,
                          shared=args.shared)
    # HBM-resident image bank: every loader batch is int32 indices; gather +
    # normalize run on device (the tunneled H2D link would otherwise dominate
    # at 33MB/step).  Uploaded ONCE for all strategies in this process.
    source.device_bank()
    print(f"suite ready in {time.time() - t_build:.0f}s "
          f"(train={sum(N_TRAIN)} test={sum(N_TEST)} imgs, "
          f"bank={source.bank.nbytes >> 20}MB on device)", flush=True)

    for il in ils:
        prefix = "" if args.arch == "crnn" else f"{args.arch}_"
        if args.skip_done and os.path.exists(
                os.path.join(args.out, f"{prefix}{il}.json")):
            print(f"== {il}: already done, skipping", flush=True)
            continue
        print(f"== {il}: starting at {time.strftime('%H:%M:%S')}", flush=True)
        try:
            run_strategy(il, args, source, memory_num, model_dims)
        except Exception:  # noqa: BLE001 — one strategy must not kill the rest
            import traceback
            print(f"== {il}: FAILED\n{traceback.format_exc()}", flush=True)


if __name__ == "__main__":
    main()
