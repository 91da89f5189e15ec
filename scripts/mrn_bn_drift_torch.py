"""Quantify frozen-expert BatchNorm running-stat drift in the UNMODIFIED
torch reference's MRN checkpoints (VERDICT r4 directive #4).

The reference freezes expert parameters after step 0 (il_modules/mrn.py:
154-157, 281-287) but runs the whole ensemble in train() mode during router
training (il_modules/mrn.py:401 model.train()), so the frozen experts' BN
RUNNING STATS keep updating on rehearsal-mixed batches.  The rebuild defaults
to pinning those stats (`mrn_pin_expert_stats=True`) after round 2's router
collapse was root-caused to exactly this drift (scripts/router_diagnose2.py).

This script measures the drift in the reference itself, from its own saved
checkpoints: for each expert i frozen at task i, compare its BN
running_mean/running_var between the checkpoint where it was freshly trained
({lan_i}_{i}_0_best_score.pth) and every later router-phase checkpoint
({lan_j}_{j}_1_best_score.pth, j >= i).

    python scripts/mrn_bn_drift_torch.py --run oracle/runs/mrn_r1500

Output: per (expert, later-checkpoint) relative drift of BN stats, plus the
accuracy matrix from data_any.txt for the collapse-vs-retention verdict.
"""

import argparse
import os
import re
import sys


def load_sd(path):
    import torch
    sd = torch.load(path, map_location="cpu")
    # strip DataParallel prefix
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def expert_bn_stats(sd, expert_idx):
    """BN running stats of expert `expert_idx` (keys model.<i>.*running_*)."""
    pat = re.compile(rf"^model\.{expert_idx}\..*running_(mean|var)$")
    return {k: v for k, v in sd.items() if pat.match(k)}


def rel_drift(a, b):
    import torch
    num = torch.linalg.vector_norm((a.float() - b.float()))
    den = torch.linalg.vector_norm(a.float()).clamp_min(1e-12)
    return float(num / den)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="oracle/runs/mrn_r1500")
    args = ap.parse_args()

    # find the experiment dir with the .pth checkpoints
    ckpts = {}
    for root, _dirs, files in os.walk(args.run):
        for f in files:
            m = re.match(r"(.+)_(\d+)_(\d+)_best_score\.pth$", f)
            if m:
                lan, taski, step = m.group(1), int(m.group(2)), int(m.group(3))
                ckpts[(taski, step)] = os.path.join(root, f)
    if not ckpts:
        print(f"no MRN checkpoints under {args.run}")
        sys.exit(1)
    print(f"checkpoints found: {sorted(ckpts)}")

    tasks = sorted({t for t, _ in ckpts})
    for i in tasks:
        if (i, 0) not in ckpts:
            continue
        fresh = expert_bn_stats(load_sd(ckpts[(i, 0)]), i)
        if not fresh:
            print(f"expert {i}: no BN running stats in step-0 ckpt (unexpected)")
            continue
        for j in tasks:
            if j < i or (j, 1) not in ckpts:
                continue
            later = expert_bn_stats(load_sd(ckpts[(j, 1)]), i)
            if not later:
                continue
            drifts = [rel_drift(fresh[k], later[k]) for k in fresh if k in later]
            if drifts:
                print(f"expert {i} @ task-{j} router ckpt: "
                      f"mean rel drift {sum(drifts)/len(drifts):.4f}, "
                      f"max {max(drifts):.4f} over {len(drifts)} BN buffers")

    data_any = os.path.join(args.run, "data_any.txt")
    if os.path.exists(data_any):
        print("\n--- accuracy matrix (reference's own data_any.txt) ---")
        print(open(data_any, encoding="utf-8").read())


if __name__ == "__main__":
    main()
