"""Router-decision diagnosis for an MRN campaign checkpoint.

Loads a saved MRN composite checkpoint (params + stacked experts + router),
rebuilds the MRNNet from the stored shapes, and for every task's test set
reports the hard-routing (TF, cross_forward_expert-equivalent) expert-argmax
histogram — i.e. which expert each task's samples are actually routed to.

This is the diagnostic for the stage-5 collapse (VERDICT r2 #1): under the
reference's binary memory(0)/current(1) router-CE labels (data_manage.py:23-29)
the router's only per-task signal is the PI=15 recognition loss flowing
through the softargmax ensemble; the histogram shows where that breaks.

    python scripts/router_diagnose.py \
        --ckpt ACCURACY_RUNS/saved/acc_mrn/Bangla_5_1_best_score.msgpack \
        [--per_task 256] [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--suite", default=None,
                    help="suite .npz cache (default: newest in ACCURACY_RUNS)")
    ap.add_argument("--per_task", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--arch", default="crnn",
                    choices=["crnn", "trba", "svtr"],
                    help="recognizer architecture of the checkpoint (same "
                         "presets as accuracy_campaign.py)")
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from mrn_tpu.models.mrn import MRNNet
    from mrn_tpu.train.checkpoint import load_model
    from scripts.accuracy_campaign import CLASSES, LANS, build_source
    from mrn_tpu.config import default_options

    t0 = time.time()
    payload = load_model(args.ckpt)
    params = payload["params"]
    batch_stats = payload.get("batch_stats", {})
    if "experts" not in params:
        # round-3+ layout: router-only params + content-addressed expert
        # blobs under <ckpt_dir>/experts/ (learners/mrn.py save_composite)
        from mrn_tpu.models.mrn import stack_expert_params

        refs = [r.decode() if isinstance(r, bytes) else str(r)
                for r in payload.get("expert_refs", [])]
        assert refs, "checkpoint holds no routed (step-1) params or refs"
        expert_dir = os.path.join(os.path.dirname(args.ckpt), "experts")
        blobs = [load_model(os.path.join(expert_dir, f"{r}.msgpack"))
                 for r in refs]
        experts = [b["params"] for b in blobs]
        counts = tuple(int(np.asarray(e["fc"]["bias"]).shape[0])
                       for e in experts)
        num_classes = max(counts)
        pred = "Attn" if args.arch == "trba" else "CTC"
        params = dict(payload.get("router") or params)
        params["experts"] = stack_expert_params(experts, num_classes, pred)
        stats = payload.get("expert_stats") or [b["batch_stats"]
                                                for b in blobs]
        if stats and stats[0]:
            batch_stats = {"experts": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, 0), *stats)}
    else:
        experts = payload.get("experts", [])
        counts = tuple(int(np.asarray(e["fc"]["bias"]).shape[0])
                       for e in experts)
        num_classes = int(np.asarray(params["experts"]["fc"]["bias"]).shape[1])
    n_experts = int(np.asarray(params["experts"]["fc"]["bias"]).shape[0])
    hidden = int(np.asarray(params["experts"]["fc"]["kernel"]).shape[1])
    print(f"ckpt: {n_experts} experts, counts={counts}, "
          f"C_total={num_classes}, hidden={hidden} "
          f"({time.time()-t0:.0f}s load)", flush=True)

    arch = dict(
        crnn=dict(transformation="None", feature_extraction="VGG",
                  sequence_modeling="BiLSTM", prediction="CTC"),
        trba=dict(transformation="TPS", feature_extraction="ResNet",
                  sequence_modeling="BiLSTM", prediction="Attn"),
        svtr=dict(transformation="None", feature_extraction="SVTR",
                  sequence_modeling="None", prediction="CTC"),
    )[args.arch]
    model = MRNNet(
        n_experts=n_experts, num_classes=num_classes, class_counts=counts,
        output_channel=512, hidden_size=hidden,
        img_size=(32, 256), **arch)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def route(image):
        out = model.apply(variables, image, cross=True, train=False,
                          is_train=False)
        return out["index"]          # [B] hard argmax expert ids

    opt = default_options(imgH=32, imgW=256)
    source = build_source(opt, seed=111, cache_dir="ACCURACY_RUNS")
    rng = np.random.default_rng(0)
    report = {}
    for j, lan in enumerate(LANS[:n_experts]):
        ds = source.tests[lan]
        # BankDataset: indices into source.bank
        n = min(args.per_task, len(ds))
        sel = rng.choice(len(ds), n, replace=False)
        idxs = [ds[int(i)][0] for i in sel]   # bank indices (int) in bank mode
        imgs = source.bank[np.asarray(idxs, np.int64)]
        imgs = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
        choices = []
        for s in range(0, n, args.batch):
            blk = imgs[s:s + args.batch]
            if len(blk) < args.batch:   # pad to compile once
                blk = np.concatenate(
                    [blk, np.zeros((args.batch - len(blk),) + blk.shape[1:],
                                   np.float32)])
                ids = np.asarray(route(jnp.asarray(blk)))[:n - s]
            else:
                ids = np.asarray(route(jnp.asarray(blk)))
            choices.append(ids)
        choices = np.concatenate(choices)
        hist = np.bincount(choices, minlength=n_experts).tolist()
        frac_correct = hist[j] / len(choices)
        report[lan] = {"task": j, "hist": hist,
                       "routed_to_self": round(100 * frac_correct, 1)}
        print(f"task {j} {lan:9s} -> hist={hist}  "
              f"self-routed={100*frac_correct:5.1f}%", flush=True)

    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump({"ckpt": args.ckpt, "report": report}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
