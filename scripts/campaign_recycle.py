"""Per-stage process-recycled accuracy campaign (VERDICT r4 #3).

The tunneled TPU client's host RSS grows over a long campaign (the 6-task
CRNN MRN run was OOM-killed at stage 4 and needed a manual --start_task
resume, ACCURACY.md run note).  This driver runs EVERY stage in a fresh
subprocess of scripts/accuracy_campaign.py, using the campaign's own
checkpoint-resume machinery (--start_task/--eval_from, which replays earlier
stages from their best checkpoints and rebuilds rehearsal memory
deterministically) plus the round-5 --stop_after flag (exit after one stage,
writing <prefix><il>.stage<K>.json).  Host RSS resets to zero between
stages, so a 6-task campaign runs unattended in one command:

    python scripts/campaign_recycle.py --il mrn --arch svtr --tasks 6 \
        --num_iter 2500 --bf16 --out ACCURACY_RUNS

Crash-safe and idempotent: a completed stage's partial JSON is never redone;
a killed stage is retried from its own start (--retries per stage).  On
completion the partial files are merged into the final <prefix><il>.json
with exactly the schema accuracy_campaign.py writes single-process, and the
stage files are kept for audit.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CAMPAIGN = os.path.join(HERE, "accuracy_campaign.py")


def stage_path(out, prefix, il, k):
    return os.path.join(out, f"{prefix}{il}.stage{k}.json")


def run_stage(args, prefix, k):
    cmd = [sys.executable, CAMPAIGN,
           "--il", args.il, "--arch", args.arch,
           "--num_iter", str(args.num_iter), "--tasks", str(args.tasks),
           "--seed", str(args.seed), "--batch_size", str(args.batch_size),
           "--out", args.out,
           "--start_task", str(k), "--eval_from", str(k),
           "--stop_after", str(k)]
    if args.bf16:
        cmd.append("--bf16")
    if args.shared:
        cmd += ["--shared", str(args.shared)]
    if args.platform:
        cmd += ["--platform", args.platform]
    if args.smoke:
        cmd.append("--smoke")
    log = os.path.join(args.out, f"{prefix}{args.il}.stage{k}.log")
    for attempt in range(args.retries + 1):
        t0 = time.time()
        print(f"[recycle] stage {k} attempt {attempt}: {' '.join(cmd)}",
              flush=True)
        with open(log, "a", encoding="utf-8") as lf:
            rc = subprocess.call(cmd, stdout=lf, stderr=subprocess.STDOUT)
        if rc == 0 and os.path.exists(stage_path(args.out, prefix, args.il,
                                                 k)):
            print(f"[recycle] stage {k} done in {time.time() - t0:.0f}s",
                  flush=True)
            return True
        print(f"[recycle] stage {k} attempt {attempt} FAILED rc={rc} "
              f"(log: {log})", flush=True)
    return False


def merge(args, prefix):
    """Assemble the final JSON from the per-stage partials — same schema as
    a single-process accuracy_campaign.py run."""
    matrix, aia, times = [], [], []
    total = 0.0
    for k in range(args.tasks):
        with open(stage_path(args.out, prefix, args.il, k),
                  encoding="utf-8") as f:
            part = json.load(f)
        # the process for stage k evaluated exactly the stages >= eval_from
        # it trained; take its rows in order (normally one)
        matrix.extend(part["rows"])
        aia.extend(part["aia"])
        # its stage_seconds covers replayed stages too; the trained stage's
        # wall time is the LAST entry
        times.append(part["stage_seconds"][-1] if part["stage_seconds"]
                     else 0.0)
        total += part.get("total_seconds", 0.0)
    final_row = matrix[-1]
    if len(matrix) > 1 and len(matrix) == len(final_row):
        forgetting = round(sum(matrix[j][j] - final_row[j]
                               for j in range(len(final_row) - 1))
                           / (len(final_row) - 1), 2)
    else:
        forgetting = 0.0 if len(matrix) == 1 else None

    # regenerate the campaign's class/instance metadata via its module
    sys.path.insert(0, HERE)
    import accuracy_campaign as ac

    result = {
        "il": args.il, "num_iter": args.num_iter,
        "train_dtype": "bf16" if args.bf16 else "f32",
        "batch_size": args.batch_size, "seed": args.seed,
        "classes": ac.CLASSES, "n_train": ac.N_TRAIN, "n_test": ac.N_TEST,
        "shared_glyphs": args.shared,
        "aia_per_stage": aia, "final_aia": aia[-1],
        "acc_matrix": matrix, "final_row": final_row,
        "avg_forgetting": forgetting,
        "stage_seconds": times, "total_seconds": round(total, 1),
        "arch": args.arch, "recycled": True,
    }
    path = os.path.join(args.out, f"{prefix}{args.il}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("il", "final_aia", "avg_forgetting", "final_row",
                       "total_seconds")}), flush=True)
    print(f"wrote {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--il", required=True)
    ap.add_argument("--arch", default="crnn",
                    choices=["crnn", "trba", "svtr"])
    ap.add_argument("--tasks", type=int, default=6)
    ap.add_argument("--num_iter", type=int, default=2500)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=111)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--shared", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default="ACCURACY_RUNS")
    ap.add_argument("--retries", type=int, default=1,
                    help="extra attempts per stage after a crash/OOM kill")
    args = ap.parse_args()
    assert args.il not in ("joint_mix", "joint_loader"), \
        "joint trains a single stage — run accuracy_campaign.py directly"
    prefix = "" if args.arch == "crnn" else f"{args.arch}_"
    os.makedirs(args.out, exist_ok=True)

    for k in range(args.tasks):
        if os.path.exists(stage_path(args.out, prefix, args.il, k)):
            print(f"[recycle] stage {k}: already done, skipping", flush=True)
            continue
        if not run_stage(args, prefix, k):
            print(f"[recycle] stage {k}: exhausted retries, aborting",
                  flush=True)
            sys.exit(1)
    merge(args, prefix)


if __name__ == "__main__":
    main()
