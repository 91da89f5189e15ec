"""Assemble TRAJECTORY.md — the system-level behavioral comparison between
the UNMODIFIED torch reference (run by oracle/run_reference.py on the
exported synthetic LMDB suite) and this rebuild run with matched settings
(oracle/jax_config.py): per-stage accuracy rows, AIA, and train/valid loss
trajectories at every validation point (VERDICT r2 #3).

    python scripts/oracle_report.py

Discovers run pairs under oracle/runs/ by tag: <il>_<tag> (torch) vs
jax_<il>_<tag> (JAX).
"""

import difflib
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RUNS = os.path.join(REPO, "oracle", "runs")

ACC_ROW = re.compile(r"^(\d+) Avg Acc: ([\d.]+)", re.M)
ACC_LIST = re.compile(r"acc: \[([^\]]*)\]")
ALL_ACC = re.compile(r"ALL Average Acc: ([\d.]+)")
# MRN step-1 logs its classification loss as "Train_loss_clf" (the router CE
# is logged separately); accept both so the mrn pairs get loss tables too.
LOSS = re.compile(r"\[(\d+)/(\d+)\] Train_loss(?:_clf)?: ([\d.nainf]+), "
                  r"Valid_loss: ([\d.nainf]+)")


def parse_data_any(path):
    if not os.path.exists(path):
        return None
    text = open(path, encoding="utf-8").read()
    rows = [[float(x) for x in m.split(",") if x.strip()]
            for m in ACC_LIST.findall(text)]
    m = ALL_ACC.search(text)
    return {"aia_per_stage": [s for _, s in ACC_ROW.findall(text)],
            "stage_avgs": [float(s) for _, s in ACC_ROW.findall(text)],
            "rows": rows, "final_aia": float(m.group(1)) if m else None}


def parse_losses(path):
    if not os.path.exists(path):
        return []
    out = []
    for m in LOSS.finditer(open(path, encoding="utf-8").read()):
        it, total, tr, va = m.groups()
        out.append((int(it), int(total), float(tr), float(va)))
    return out


def find_logs(run_dir):
    """(data_any.txt, log_train.txt) under a run dir, either layout."""
    data_any = os.path.join(run_dir, "data_any.txt")
    log_train = None
    for root, _dirs, files in os.walk(run_dir):
        if "log_train.txt" in files:
            log_train = os.path.join(root, "log_train.txt")
    return data_any, log_train


def fmt_row(row):
    return "[" + ", ".join(f"{x:.2f}" for x in row) + "]"


def main():
    pairs = []
    if os.path.isdir(RUNS):
        for name in sorted(os.listdir(RUNS)):
            if name.startswith("jax_"):
                torch_name = name[len("jax_"):]
                if os.path.isdir(os.path.join(RUNS, torch_name)):
                    pairs.append((torch_name, name))
    if not pairs:
        print("no matched torch/jax run pairs under oracle/runs/")
        sys.exit(1)

    lines = [
        "# TRAJECTORY — torch reference vs rebuild, matched system-level runs",
        "",
        "The UNMODIFIED reference (`/root/reference/tiny_train.py`, driven by",
        "`oracle/run_reference.py` with dependency shims) and this rebuild",
        "(`train.py --config oracle/jax_config.py`) run the SAME synthetic",
        "LMDB suite (`oracle/data/`, exported by scripts/export_oracle_lmdb.py",
        "from the campaign suite) with matched settings: CRNN",
        "output_channel=128 hidden_size=64, batch 32, Adam 5e-4 OneCycle,",
        "grad-clip 5, seed 111, identical task order and per-task dict.txt",
        "growth.  Torch and JAX differ in init distributions and data-order",
        "RNGs, so the comparison is trajectory-level (per-stage accuracy and",
        "loss at matched validation points), not bitwise.  The torch side",
        "always runs on the host CPU (torch is CPU-only in this image); the",
        "rebuild side runs on whichever backend was active for its run —",
        "matched optimization settings, not matched hardware.",
        "",
    ]
    for torch_name, jax_name in pairs:
        t_any, t_log = find_logs(os.path.join(RUNS, torch_name))
        j_any, j_log = find_logs(os.path.join(RUNS, jax_name))
        t = parse_data_any(t_any)
        j = parse_data_any(j_any)
        lines.append(f"## {torch_name} (torch) vs {jax_name} (rebuild)")
        lines.append("")
        if not t or not j:
            lines.append("*(one side missing — run incomplete)*")
            lines.append("")
            continue
        lines.append("| stage | torch acc row | rebuild acc row | torch avg | rebuild avg |")
        lines.append("|---|---|---|---|---|")
        for i in range(max(len(t["rows"]), len(j["rows"]))):
            tr = fmt_row(t["rows"][i]) if i < len(t["rows"]) else "—"
            jr = fmt_row(j["rows"][i]) if i < len(j["rows"]) else "—"
            ta = f'{t["stage_avgs"][i]:.2f}' if i < len(t["stage_avgs"]) else "—"
            ja = f'{j["stage_avgs"][i]:.2f}' if i < len(j["stage_avgs"]) else "—"
            lines.append(f"| {i} | {tr} | {jr} | {ta} | {ja} |")
        d = (None if t["final_aia"] is None or j["final_aia"] is None
             else j["final_aia"] - t["final_aia"])
        lines.append("")
        lines.append(f"**Final AIA** — torch: {t['final_aia']}, rebuild: "
                     f"{j['final_aia']}"
                     + (f" (Δ {d:+.2f})" if d is not None else ""))
        lines.append("")
        tl, jl = parse_losses(t_log), parse_losses(j_log)
        if tl and jl:
            # The two sides can log at different cadences (MRN's router step)
            # or have resumed logs missing early tasks — align on matching
            # [iter/total] label subsequences instead of zipping by index.
            t_labels = [(it, tot) for it, tot, _, _ in tl]
            j_labels = [(it, tot) for it, tot, _, _ in jl]
            matcher = difflib.SequenceMatcher(None, t_labels, j_labels,
                                              autojunk=False)
            lines.append("| val point | torch train loss | rebuild train loss "
                         "| torch valid loss | rebuild valid loss |")
            lines.append("|---|---|---|---|---|")
            for a, b, size in matcher.get_matching_blocks():
                for k in range(size):
                    ti, tt, ttr, tva = tl[a + k]
                    _, _, jtr, jva = jl[b + k]
                    lines.append(f"| [{ti}/{tt}] | {ttr:.3f} | {jtr:.3f} | "
                                 f"{tva:.3f} | {jva:.3f} |")
            lines.append("")
    out = os.path.join(REPO, "TRAJECTORY.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
