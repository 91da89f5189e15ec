"""Pure inference CLI — recognize text in a folder of word-crop images
(no labels required; the serving-path complement to evaluate_cli.py):

    python recognize_cli.py --config configs/crnn_mrn.py \
        --saved_model saved_models/CRNN_MRN/Bangla_5_1_best_score.msgpack \
        --image_folder ./crops [--taski 5]

Prints one line per image: path<TAB>prediction<TAB>confidence.  Uses the same
checkpoint-rebuild path as evaluate_cli (cumulative dictionary over tasks
0..taski) and the RawDataset folder walker (reference: data/dataset.py:115-142
— the reference ships RawDataset but no CLI surface for it)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from mrn_tpu.config import load_config
from mrn_tpu.data.dataset import RawDataset
from mrn_tpu.data.manager import EpochLoader
from mrn_tpu.data.transform import build_transform


def recognize(learner, opt, image_folder: str):
    """Yields (path, prediction, confidence) for every image in the folder."""
    ds = RawDataset(image_folder, opt)
    if len(ds) == 0:
        return
    loader = EpochLoader(ds, opt.batch_size, build_transform(opt, mode="test"),
                         shuffle=False, pad_to_batch=True,
                         rng=np.random.default_rng(opt.manual_seed))
    converter = learner.converter
    eval_batch = learner.make_eval_batch("test")
    is_attn = opt.Prediction == "Attn"
    for images, paths, n_valid in loader:
        # dummy targets: eval_batch computes a loss we ignore
        labels_index, lengths = converter.encode(
            [""] * len(paths), batch_max_length=opt.batch_max_length)
        out = eval_batch(images, labels_index, lengths)
        preds_index = np.asarray(out["preds_index"])
        max_probs = np.asarray(out["max_probs"])
        s = preds_index.shape[1]
        words = converter.decode(preds_index,
                                 np.full((preds_index.shape[0],), s))
        for i in range(n_valid):
            prd, prd_max_prob = words[i], max_probs[i]
            if is_attn:  # same confidence convention as train/evaluate.py
                eos = prd.find("[EOS]")
                if eos >= 0:
                    prd = prd[:eos]
                    prd_max_prob = prd_max_prob[:eos]
            conf = float(np.prod(prd_max_prob)) if len(prd_max_prob) else 0.0
            yield paths[i], prd, conf


def main():
    if os.environ.get("MRN_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["MRN_TPU_PLATFORM"])
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--saved_model", required=True)
    parser.add_argument("--image_folder", required=True)
    parser.add_argument("--taski", type=int, default=None,
                        help="cumulative-dict task index (default: last)")
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()

    opt = load_config(args.config)
    if args.batch_size:
        opt.batch_size = args.batch_size
    np.random.seed(opt.manual_seed)
    last_task = args.taski if args.taski is not None else len(opt.lan_list) - 1

    from evaluate_cli import load_learner
    learner = load_learner(opt, args.saved_model, last_task)
    for path, word, conf in recognize(learner, opt, args.image_folder):
        print(f"{path}\t{word}\t{conf:.4f}")


if __name__ == "__main__":
    main()
