"""Roofline for TRBA's recurrent phases (VERDICT r4 weak #8: "the int8
path stops at the conv extractor: the BiLSTM (3.5 ms) and decoder (4 ms)
stay bf16").

Static analysis, no device needed.  Question: would extending w8a8 int8
(ops/int8.py) into the BiLSTM and attention decoder buy anything?

Method: count the MACs each recurrent phase actually issues per image
(geometry from the built model: ResNet emits [B, 1, W/4+1=26, 512],
BiLSTM hidden 256, decoder hidden 256, 26 decode steps, 4.5k-class
generator — models/lstm.py, models/attention.py, reference
modules/sequence_modeling.py:4-22 + modules/prediction.py:8-118), convert
to MXU-busy time at the v5e bf16 peak, and compare against the measured
wall time of those phases (README perf table: BiLSTM 3.5 ms + greedy
decode 4 ms at bs256).  The gap is sequential scan-step latency (65 BiLSTM
steps + 26 decoder steps dispatch one small matmul each); int8's 2x MXU
OPS can only halve the MXU-busy slice.

Run:  python scripts/trba_recurrent_roofline.py [--bs 256]
"""

import argparse

PEAK_TF_BF16 = 197.0  # v5e dense bf16 peak, TF/s

# TRBA geometry (32x100 crop)
T_SEQ = 26          # ResNet width: W/4 + 1 (models/resnet.py:3)
IN_LSTM = 512       # ResNet output channels
H = 256             # hidden_size (BiLSTM + decoder)
EMB = 256           # decoder char-embedding width
STEPS = 26          # batch_max_length + 1 decode steps
CLASSES = 4500      # MLT-scale growable head


def phases():
    """(name, macs_per_image, sequential_steps) per recurrent phase."""
    # two stacked BidirectionalLSTMs (models/composer.py:83-87, reference
    # modules/sequence_modeling nn.Sequential of two)
    bilstm = [
        # one big MXU matmul outside each scan (models/lstm.py:80)
        ("seq0 input proj   [T,512]@[512,4H] x2dir", 2 * T_SEQ * IN_LSTM * 4 * H, 0),
        ("seq0 recurrence   [2,H]@[H,4H] x T", 2 * T_SEQ * H * 4 * H, T_SEQ),
        ("seq0 out linear   [T,2H]@[2H,H]", T_SEQ * 2 * H * H, 0),
        ("seq1 input proj   [T,H]@[H,4H] x2dir", 2 * T_SEQ * H * 4 * H, 0),
        ("seq1 recurrence   [2,H]@[H,4H] x T", 2 * T_SEQ * H * 4 * H, T_SEQ),
        ("seq1 out linear   [T,2H]@[2H,H]", T_SEQ * 2 * H * H, 0),
    ]
    dec_step = (H * H            # h2h
                + H              # score
                + (H + EMB) * 4 * H  # LSTMCell input projection
                + H * CLASSES)   # generator (the growable fc)
    decoder = [
        ("decoder i2h       [T,H]@[H,H] (pre-scan)", T_SEQ * H * H, 0),
        ("decoder scan steps (h2h+cell+generator)", STEPS * dec_step, STEPS),
    ]
    return bilstm + decoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--measured-ms", type=float, default=7.5,
                    help="measured BiLSTM+decode wall ms at --bs (README: 3.5+4)")
    ap.add_argument("--step-ms", type=float, default=49.7,
                    help="measured full TRBA eval step ms at --bs")
    args = ap.parse_args()

    total_macs = 0
    total_steps = 0
    print(f"per-image MAC inventory, recurrent TRBA phases (bs{args.bs}):")
    print(f"{'phase':48s} {'MMACs/img':>10s} {'seq steps':>10s}")
    for name, macs, steps in phases():
        total_macs += macs
        total_steps += steps
        print(f"{name:48s} {macs/1e6:10.2f} {steps:10d}")
    flop_batch = 2 * total_macs * args.bs
    mxu_ms = flop_batch / (PEAK_TF_BF16 * 1e12) * 1e3
    print(f"{'TOTAL':48s} {total_macs/1e6:10.2f} {total_steps:10d}")
    print()
    print(f"MXU-busy time at bf16 peak (bs{args.bs})  : {mxu_ms:6.3f} ms")
    print(f"measured BiLSTM+decode wall time         : {args.measured_ms:6.2f} ms"
          f"  ({args.measured_ms / args.step_ms:.0%} of the {args.step_ms} ms step)")
    print(f"MXU-busy share of the recurrent phases   : "
          f"{mxu_ms / args.measured_ms:6.1%}")
    print(f"per-sequential-step overhead             : "
          f"{(args.measured_ms - mxu_ms) / total_steps * 1e3:6.1f} us/step "
          f"({total_steps} steps)")
    int8_save = mxu_ms / 2
    print()
    print(f"int8 ceiling (2x MXU OPS on every recurrent matmul): saves "
          f"<= {int8_save:.3f} ms = {int8_save / args.step_ms:.2%} of the "
          f"end-to-end step.")
    print("conclusion: the recurrent phases are sequential-dispatch-bound, "
          "not FLOP-bound; the real lever is batch scaling (amortizes the "
          "per-step overhead — bench.py 'TRBA int8 bs1024' row), not "
          "quantizing the scans.")


if __name__ == "__main__":
    main()
