"""Per-phase MXU tick table for the fused SVTR inference kernel
(VERDICT r4 #5: prove the ~35% dense-FLOP MFU is shape-tight for bf16).

Static analysis, no device needed.  Model (v5e, one MXU pass per tick):
every matmul [M, K] @ [K, N] issues on the MXU with

  - the contraction dim padded to 128 lanes          (K -> ceil(K/128)*128)
  - the output dim padded to 128 lanes               (N -> ceil(N/128)*128)
  - rows padded to the 8-sublane granule             (M -> ceil(M/8)*8)

so its tick cost is proportional to Mp*Kp*Np MACs while its dense (useful)
work is M*K*N.  "MXU efficiency" = dense/padded.  Summing padded MACs over
every matmul the fused kernel actually issues (ops/svtr_block.py phases, at
the banded-plan geometries `_band_spec` selects) gives the shape-tight
speed-of-light: the throughput the chip could reach if the MXU were the only
cost and every pass were back-to-back.  Comparing the measured headline
against it separates "the kernel is inefficient" from "the model's shapes
(head_dim 32, stage-1 width 64) cannot fill a 128-lane MXU".

Run:  python scripts/mxu_tick_table.py [--bs 2048] [--peak-tf 197]
"""

import argparse
import sys
from dataclasses import dataclass, field

sys.path.insert(0, "/root/repo")

PEAK_TF_BF16 = 197.0  # v5e dense bf16 peak, TF/s


def pad(v, g):
    return -(-v // g) * g


@dataclass
class Phase:
    name: str
    dense_macs: float = 0.0
    padded_macs: float = 0.0
    detail: list = field(default_factory=list)

    def add(self, m, k, n, count=1, note=""):
        d = m * k * n * count
        p = pad(m, 8) * pad(k, 128) * pad(n, 128) * count
        self.dense_macs += d
        self.padded_macs += p
        if note:
            self.detail.append((note, m, k, n, count, d, p))


def svtr_phases():
    """Per-IMAGE matmul inventory of the fused SVTR path (ops/svtr_block.py
    + the 4500-class CTC head), at the shapes the bench runs (32x256 crops,
    embed (64,128,256), depth (3,6,3), heads (2,4,8))."""
    from mrn_tpu.ops.svtr_block import _band_spec

    stages = [  # (dim, heads, (h, w), n_local, n_global)
        (64, 2, (8, 64), 3, 0),
        (128, 4, (4, 64), 3, 3),
        (256, 8, (2, 64), 0, 3),
    ]
    proj = Phase("projections (qkv/proj/fc1/fc2)")
    attn = Phase("attention scores (QK^T)")
    pv = Phase("attention PV (+ones row-sum col)")
    head = Phase("CTC head fc (256->4500)")
    stem = Phase("patch-embed + subsample convs")

    for dim, heads, (h, w), n_local, n_global in stages:
        n = h * w
        d = dim // heads
        nblk = n_local + n_global
        # block projections, group-batched over images -> rows are N per image
        proj.add(n, dim, 3 * dim, nblk, f"qkv  s{dim}")
        proj.add(n, dim, dim, nblk, f"proj s{dim}")
        proj.add(n, dim, 4 * dim, nblk, f"fc1  s{dim}")
        proj.add(n, 4 * dim, dim, nblk, f"fc2  s{dim}")
        # Local blocks: banded plan; Global: full window
        spec = _band_spec(h, w, 7, 11)
        if n_local:
            if spec is None:
                qb, width, starts = n, n, (0,)
            else:
                qb, width, starts = spec[0], spec[1], spec[2]
            nq = len(starts)
            attn.add(qb, d, width, heads * nq * n_local,
                     f"banded s{dim} qb{qb} w{width}")
            pv.add(qb, width, d + 1, heads * nq * n_local,
                   f"banded s{dim}")
        if n_global:
            attn.add(n, d, n, heads * n_global, f"full s{dim} N{n}")
            pv.add(n, n, d + 1, heads * n_global, f"full s{dim}")

    head.add(64, 256, 4500, 1, "fc")

    # stem convs as implicit matmuls: rows = output pixels, K = kh*kw*cin
    # (XLA lowers conv to MXU passes with the same padding behavior)
    stem.add(16 * 128, 3 * 3 * 4, 32, 1, "pe conv1 /2")
    stem.add(8 * 64, 3 * 3 * 32, 64, 1, "pe conv2 /2")
    stem.add(4 * 64, 3 * 3 * 64, 128, 1, "sub1")
    stem.add(2 * 64, 3 * 3 * 128, 256, 1, "sub2")
    stem.add(1 * 64, 3 * 3 * 256, 512, 1, "sub3")
    return [stem, proj, attn, pv, head]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2048)
    ap.add_argument("--peak-tf", type=float, default=PEAK_TF_BF16)
    ap.add_argument("--measured", type=float, default=30110.0,
                    help="measured crops/s at --bs (r5 in-session bs2048)")
    ap.add_argument("--detail", action="store_true")
    args = ap.parse_args()

    phases = svtr_phases()
    tot_d = sum(p.dense_macs for p in phases)
    tot_p = sum(p.padded_macs for p in phases)

    print(f"per-image matmul inventory (fused SVTR path, 32x256 crop):")
    print(f"{'phase':38s} {'dense GFLOP':>12s} {'padded GFLOP':>13s} "
          f"{'MXU eff':>8s} {'tick share':>10s}")
    for p in phases:
        print(f"{p.name:38s} {2*p.dense_macs/1e9:12.3f} "
              f"{2*p.padded_macs/1e9:13.3f} "
              f"{p.dense_macs/p.padded_macs:8.1%} "
              f"{p.padded_macs/tot_p:10.1%}")
        if args.detail:
            for note, m, k, n, c, d, pp in p.detail:
                print(f"    {note:22s} [{m:4d}x{k:4d}x{n:4d}]x{c:<3d} "
                      f"dense {2*d/1e9:7.3f}  padded {2*pp/1e9:7.3f}")
    print(f"{'TOTAL':38s} {2*tot_d/1e9:12.3f} {2*tot_p/1e9:13.3f} "
          f"{tot_d/tot_p:8.1%}")

    peak = args.peak_tf * 1e12
    sol_dense = peak / (2 * tot_d)      # crops/s if every MAC were useful
    sol_padded = peak / (2 * tot_p)     # crops/s at the shape-tight tick count
    print()
    print(f"dense speed-of-light        : {sol_dense:10,.0f} crops/s")
    print(f"shape-tight speed-of-light  : {sol_padded:10,.0f} crops/s "
          f"(padded ticks, MXU-only)")
    print(f"measured (bs{args.bs})          : {args.measured:10,.0f} crops/s")
    print(f"  = {args.measured/sol_dense:5.1%} of dense SoL "
          f"(the README 'MFU' number)")
    print(f"  = {args.measured/sol_padded:5.1%} of shape-tight SoL "
          f"(MXU ticks the shapes force)")


if __name__ == "__main__":
    main()
