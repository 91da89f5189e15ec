"""Stage-5 collapse isolation: router vs expert-output vs BN-stat drift.

The stage-5 histogram (router_diagnose.py) shows routing is ~83-98% correct,
so the 11.6% Bangla self-acc must come from the expert output itself.  This
script measures word accuracy on the degraded tasks under four conditions:

  A. routed TF eval with the stage-5 checkpoint (reproduces the campaign row)
  B. FORCED self-expert, stage-5 (drifted) batch stats
  C. FORCED self-expert, PRISTINE batch stats from that expert's step-0
     standalone checkpoint
  D. standalone step-0 checkpoint as its own Recognizer (upper bound)

B vs C isolates BatchNorm running-stat drift during router training (frozen
experts run in train mode through the mixed rehearsal stream — both in the
reference, which flips model.train() back on after the first val
(il_modules/mrn.py val:388-401), and in our vmapped ensemble).

    python scripts/router_diagnose2.py [--per_task 192]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP0 = {
    0: "Chinese_0_0", 1: "Latin_1_0", 2: "Japanese_2_0",
    3: "Korean_3_0", 4: "Arabic_4_0", 5: "Bangla_5_0",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--saved", default="ACCURACY_RUNS/saved/acc_mrn")
    ap.add_argument("--per_task", type=int, default=192)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tasks", default="1,3,5",
                    help="task ids to evaluate (comma list)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mrn_tpu.codec import build_converter
    from mrn_tpu.config import default_options
    from mrn_tpu.models.composer import Recognizer
    from mrn_tpu.models.mrn import MRNNet
    from mrn_tpu.train.checkpoint import load_model
    from scripts.accuracy_campaign import LANS, build_source

    opt = default_options(imgH=32, imgW=256)
    source = build_source(opt, seed=111, cache_dir="ACCURACY_RUNS")
    characters = source.cumulative_character(5)
    converter = build_converter("CTC", characters)
    print(f"converter classes={converter.num_classes}", flush=True)

    payload = load_model(os.path.join(args.saved,
                                      "Bangla_5_1_best_score.msgpack"))
    params, stats = payload["params"], payload["batch_stats"]
    counts = tuple(int(np.asarray(e["fc"]["bias"]).shape[0])
                   for e in payload["experts"])
    n_experts = len(counts)
    C = int(np.asarray(params["experts"]["fc"]["bias"]).shape[1])
    assert C == converter.num_classes, (C, converter.num_classes)

    mrn = MRNNet(n_experts=n_experts, num_classes=C, class_counts=counts,
                 prediction="CTC", transformation="None",
                 feature_extraction="VGG", sequence_modeling="BiLSTM",
                 output_channel=512, hidden_size=256, img_size=(32, 256))
    rec = Recognizer(num_classes=C, prediction="CTC", transformation="None",
                     feature_extraction="VGG", sequence_modeling="BiLSTM",
                     output_channel=512, hidden_size=256, img_size=(32, 256))

    def slice_expert(tree, j):
        return jax.tree_util.tree_map(lambda x: x[j], tree)

    @jax.jit
    def routed(image):
        out = mrn.apply({"params": params, "batch_stats": stats}, image,
                        cross=True, train=False, is_train=False)
        return jnp.argmax(out["logits"], 2)

    def forced_fn(j, expert_stats):
        ep = slice_expert(params["experts"], j)

        @jax.jit
        def run(image):
            out = rec.apply({"params": ep, "batch_stats": expert_stats},
                            image, train=False, is_train=False)
            return jnp.argmax(out["predict"], 2)
        return run

    def accuracy(decode_fn, imgs, labels):
        correct = 0
        n = len(labels)
        for s in range(0, n, args.batch):
            blk = imgs[s:s + args.batch]
            m = len(blk)
            if m < args.batch:
                blk = np.concatenate([blk, np.zeros(
                    (args.batch - m,) + blk.shape[1:], np.float32)])
            idx = np.asarray(decode_fn(jnp.asarray(blk)))[:m]
            length = np.full(m, idx.shape[1], np.int32)
            preds = converter.decode(idx, length)
            correct += sum(p == g for p, g in zip(preds, labels[s:s + m]))
        return 100.0 * correct / n

    rng = np.random.default_rng(0)
    for j in [int(t) for t in args.tasks.split(",")]:
        lan = LANS[j]
        ds = source.tests[lan]
        n = min(args.per_task, len(ds))
        sel = rng.choice(len(ds), n, replace=False)
        pairs = [ds[int(i)] for i in sel]
        idxs = np.asarray([p[0] for p in pairs], np.int64)
        labels = [p[1] for p in pairs]
        imgs = (source.bank[idxs].astype(np.float32) / 255.0 - 0.5) / 0.5

        acc_a = accuracy(routed, imgs, labels)
        drift_stats = slice_expert(stats["experts"], j) if stats else {}
        acc_b = accuracy(forced_fn(j, drift_stats), imgs, labels)
        p0 = load_model(os.path.join(args.saved,
                                     f"{STEP0[j]}_best_score.msgpack"))
        acc_c = accuracy(forced_fn(j, p0["batch_stats"]), imgs, labels)
        # sanity: frozen expert params in the stacked tree == step-0 params
        from mrn_tpu.models.mrn import pad_expert_tree
        ep0 = pad_expert_tree(p0["params"], C, "CTC")
        same = all(np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(slice_expert(params["experts"], j)),
            jax.tree_util.tree_leaves(ep0)))

        rec_j = Recognizer(num_classes=counts[j], prediction="CTC",
                           transformation="None", feature_extraction="VGG",
                           sequence_modeling="BiLSTM", output_channel=512,
                           hidden_size=256, img_size=(32, 256))

        @jax.jit
        def standalone(image, _p=p0["params"], _s=p0["batch_stats"],
                       _m=rec_j):
            out = _m.apply({"params": _p, "batch_stats": _s}, image,
                           train=False, is_train=False)
            return jnp.argmax(out["predict"], 2)

        acc_d = accuracy(standalone, imgs, labels)

        # stat drift magnitude for this expert
        def rel(a, b):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            return float(np.mean(np.abs(a - b)) / (np.mean(np.abs(b)) + 1e-9))
        drifts = jax.tree_util.tree_map(rel, drift_stats, p0["batch_stats"])
        mean_drift = float(np.mean(jax.tree_util.tree_leaves(drifts)))

        print(f"task {j} {lan:9s}: routed_TF={acc_a:5.1f}  "
              f"forced+drifted={acc_b:5.1f}  forced+pristine={acc_c:5.1f}  "
              f"standalone={acc_d:5.1f}  stat_drift={mean_drift:.3f}  "
              f"params_frozen_ok={same}", flush=True)


if __name__ == "__main__":
    main()
