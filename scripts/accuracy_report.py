"""Assemble ACCURACY.md from ACCURACY_RUNS/<il>.json files produced by
scripts/accuracy_campaign.py.

    python scripts/accuracy_report.py [--runs ACCURACY_RUNS] [--out ACCURACY.md]
"""

import argparse
import glob
import json
import os

ORDER = ["base", "ewc", "lwf", "wa", "der", "mrn", "joint_mix", "joint_loader"]
LANS = ["Chinese", "Latin", "Japanese", "Korean", "Arabic", "Bangla"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="ACCURACY_RUNS")
    ap.add_argument("--out", default="ACCURACY.md")
    args = ap.parse_args()

    results = {}
    for path in glob.glob(os.path.join(args.runs, "*.json")):
        with open(path, encoding="utf-8") as f:
            r = json.load(f)
        if "il" in r:  # skip non-run artifacts (e.g. router_hist_*.json)
            results[r["il"]] = r
    ils = [il for il in ORDER if il in results]
    if not ils:
        raise SystemExit(f"no runs found in {args.runs}")

    first = results[ils[0]]
    lines = [
        "# ACCURACY — 6-task synthetic AIA campaign (MLT17-shape proxy)\n",
        "\nProtocol: reference il_modules/base.py:363-436 — per task, train,"
        " reload the best checkpoint, evaluate ALL seen tasks; AIA = mean"
        " over stages of the per-stage mean accuracy.  Suite: 6 tasks in the"
        " reference order with the reference's per-task class counts"
        f" {first['classes']} (README.md:100), FULL MLT17 instance counts"
        f" {first['n_train']} train / {first['n_test']} test (README.md:98-99),"
        " Zipf(1.0) character frequencies + short-biased word lengths (like"
        f" real scene text), batch {first['batch_size']},"
        f" {first['num_iter']} iters/task (1/4 of the reference's 10k),"
        " Adam 5e-4 + OneCycle, clip 5, seed"
        f" {first['seed']}, 32x256 RGBA, CRNN backbone, run on TPU v5e"
        " (HBM-resident image bank).\n",
        "\n## Headline: final AIA + average forgetting\n",
        "\n| Strategy | Final AIA % | Avg forgetting % | Final per-task row |"
        " dtype | Wall time |",
        "|---|---|---|---|---|---|",
    ]
    for il in ils:
        r = results[il]
        mark = f" ({len(r['acc_matrix'])}/6 stages)" if r.get("incomplete") \
            else ""
        forget = ("—" if r.get("avg_forgetting") is None
                  else f"{r['avg_forgetting']:.2f}")
        lines.append(
            f"| {il}{mark} | **{r['final_aia']:.2f}** |"
            f" {forget} |"
            f" {r['final_row']} | {r.get('train_dtype', 'f32')} |"
            f" {r['total_seconds']:.0f}s |")

    lines.append("\n## AIA per stage (incremental curve)\n")
    header = "| Strategy | " + " | ".join(
        f"T{i} {LANS[i][:2]}" for i in range(6)) + " |"
    lines += [header, "|---|" + "---|" * 6]
    for il in ils:
        r = results[il]
        vals = r["aia_per_stage"]
        row = ["—" if v is None else f"{v:.2f}" for v in vals] \
            + ["—"] * (6 - len(vals))
        lines.append(f"| {il} | " + " | ".join(row) + " |")

    lines.append("\n## Accuracy matrices (rows = after task i; cols = task j)\n")
    for il in ils:
        r = results[il]
        lines.append(f"\n### {il}\n")
        lines.append("| after \\ task | " + " | ".join(
            LANS[:len(r['final_row'])]) + " |")
        lines.append("|---|" + "---|" * len(r["final_row"]))
        for i, row in enumerate(r["acc_matrix"]):
            if row is None:  # stage skipped by a checkpoint-resumed run
                cells = ["—"] * len(r["final_row"])
            else:
                cells = [f"{v:.1f}" for v in row] + \
                    ["—"] * (len(r["final_row"]) - len(row))
            lines.append(f"| {i} | " + " | ".join(cells) + " |")

    # ordering acceptance check (BASELINE.md: the paper's qualitative result)
    lines.append("\n## Ordering acceptance (paper's qualitative result)\n")
    lines.append("\nExpected: base < ewc ≈ lwf < wa < der < mrn < joint"
                 " (arXiv 2305.14758; BASELINE.md paper-table targets"
                 " reproduced below for reference).\n")
    paper = {"base": 23, "ewc": 24, "lwf": 28, "wa": 35, "der": 41,
             "mrn": 52, "joint_mix": 70}
    lines.append("\n| Strategy | Ours (synthetic proxy) | Paper MLT17"
                 " (approx, real data) |")
    lines.append("|---|---|---|")
    for il in ils:
        lines.append(f"| {il} | {results[il]['final_aia']:.2f} |"
                     f" ~{paper.get(il, '—')} |")
    # acceptance is evaluated at the FINAL stage — the paper's headline is
    # the 6-task endpoint; a per-stage breakdown follows so partial failures
    # are visible rather than hidden behind a single favorable stage
    def aia(il, stage):
        r = results.get(il)
        if r is None:
            return None
        if il == "joint_mix":
            return r["final_aia"]  # joint trains once; single stage
        s = r["aia_per_stage"]
        return s[stage] if len(s) > stage else None
    pairs = [("base", "wa"), ("base", "der"), ("base", "mrn"),
             ("wa", "der"), ("wa", "mrn"), ("der", "mrn"),
             ("mrn", "joint_mix")]
    final_stage = max(len(results[il]["aia_per_stage"]) for il in ils
                      if il != "joint_mix") - 1
    checks = []
    for lo, hi in pairs:
        a, b = aia(lo, final_stage), aia(hi, final_stage)
        if a is None or b is None:
            continue
        ok = b > a if hi != "joint_mix" else b >= a * 0.9  # mrn ≈ joint
        checks.append(f"- {lo} ({a:.2f}) < {hi} ({b:.2f}): "
                      f"{'PASS' if ok else 'FAIL'}")
    lines.append(f"\nChecks at the FINAL stage ({final_stage}) AIA:\n")
    lines += checks
    lines.append("\nPer-stage check results (stages 1..final):\n")
    lines.append("| check | " + " | ".join(
        f"s{s}" for s in range(1, final_stage + 1)) + " |")
    lines.append("|---|" + "---|" * final_stage)
    for lo, hi in pairs:
        cells = []
        for s in range(1, final_stage + 1):
            a, b = aia(lo, s), aia(hi, s)
            if a is None or b is None:
                cells.append("—")
            else:
                ok = b > a if hi != "joint_mix" else b >= a * 0.9
                cells.append("PASS" if ok else "FAIL")
        lines.append(f"| {lo} < {hi} | " + " | ".join(cells) + " |")
    lines.append("\nRegularization-only methods (ewc/lwf) are expected only"
                 " to edge out base; on disjoint-alphabet tasks their"
                 " retention is structurally limited (no shared glyphs to"
                 " anchor old-task features) — so their ordering checks run"
                 " on the OVERLAP suite below, not here.\n")

    # ---- overlap-suite regularization checks (VERDICT r2 #4) -------------
    # a separate campaign dir (accuracy_campaign.py --shared N --out
    # <runs>/overlap) whose tasks share a glyph slice, the analogue of MLT's
    # cross-script Latin digits (reference README.md:94-103) — the structure
    # EWC/LwF need for measurable retention
    ov_dir = os.path.join(args.runs, "overlap")
    ov_note = os.path.join(ov_dir, "NOTE.md")
    ov = {}
    for path in glob.glob(os.path.join(ov_dir, "*.json")):
        with open(path, encoding="utf-8") as f:
            r = json.load(f)
        if "il" in r:
            ov[r["il"]] = r
    if ov:
        shared = next(iter(ov.values())).get("shared_glyphs", "?")
        lines.append("\n## Overlap suite: regularization ordering"
                     " (base ≤ ewc, base ≤ lwf)\n")
        lines.append(f"\nSame protocol with a {shared}-glyph shared slice"
                     " prepended to every task alphabet (top Zipf ranks — the"
                     " digits/punctuation analogue of real MLT).\n")
        lines.append("\n| Strategy | Final AIA % | Avg forgetting % |"
                     " Final per-task row |")
        lines.append("|---|---|---|---|")
        for il in [i for i in ORDER if i in ov]:
            r = ov[il]
            forget = ("—" if r.get("avg_forgetting") is None
                      else f"{r['avg_forgetting']:.2f}")
            lines.append(f"| {il} | **{r['final_aia']:.2f}** | {forget} |"
                         f" {r['final_row']} |")
        ov_checks = []
        for lo, hi in [("base", "ewc"), ("base", "lwf")]:
            if lo in ov and hi in ov:
                a, b = ov[lo]["final_aia"], ov[hi]["final_aia"]
                ok = b >= a
                ov_checks.append(f"- AIA: {lo} ({a:.2f}) <= {hi} ({b:.2f}): "
                                 f"{'PASS' if ok else 'FAIL'}")
        # retention is the metric regularization actually targets — require
        # the penalty to reduce forgetting (lower is better)
        for reg in ("ewc", "lwf"):
            if "base" in ov and reg in ov and \
                    ov["base"].get("avg_forgetting") is not None and \
                    ov[reg].get("avg_forgetting") is not None:
                a = ov["base"]["avg_forgetting"]
                b = ov[reg]["avg_forgetting"]
                ok = b <= a
                ov_checks.append(f"- forgetting: {reg} ({b:.2f}) <= base"
                                 f" ({a:.2f}): {'PASS' if ok else 'FAIL'}")
        if ov_checks:
            lines.append("\nOverlap-suite acceptance:\n")
            lines += ov_checks
        if os.path.exists(ov_note):
            with open(ov_note, encoding="utf-8") as f:
                lines.append("\n" + f.read().strip() + "\n")
    for il in ils:
        for key in ("incomplete", "note"):
            if results[il].get(key):
                lines.append(f"\nRun note ({il}): {results[il][key]}\n")
    if any(results[il].get("train_dtype") == "bf16" for il in ils):
        lines.append("\ndtype note: strategies marked bf16 trained with"
                 " mixed precision (bf16 compute, f32 master params /"
                 " optimizer state / BN stats) — DER's 5-6 stacked 512-ch"
                 " extractors and the MRN ensemble exceed single-chip HBM"
                 " in f32 next to the device-resident image bank.\n")
    with open(args.out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(ils)} strategies: {ils})")


if __name__ == "__main__":
    main()
