"""AOT model export for serving — compile a checkpoint's inference function
to a serialized StableHLO artifact (jax.export) that any JAX runtime can run
without the model code:

    python export_cli.py --config configs/svtr_mrn.py \
        --saved_model saved_models/.../T5_5_1_best_score.msgpack \
        --out svtr.jaxexport --batch_size 512 [--dtype bf16] [--taski 5]

    # serve it back (no mrn_tpu model code needed at load time):
    from jax import export
    exp = export.deserialize(open("svtr.jaxexport", "rb").read())
    logits = exp.call(images)     # float32 [B, T, C] — greedy-decode on top

The exported function is image -> logits (the prediction head's output);
decoding (CTC collapse / Attn EOS pruning) stays host-side via
mrn_tpu.codec.  The reference has no serving/export surface at all — this is
the deployment-path extension of its test.py.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export_inference(learner, opt, batch_size: int, dtype_name: str = "bf16"):
    """Returns (serialized bytes, output shape) for the learner's current
    eval forward at the given batch size."""
    import jax
    import jax.numpy as jnp
    from jax import export

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        learner.params)
    stats = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        learner.batch_stats)
    variables = {"params": params, "batch_stats": stats}
    eval_quant = getattr(learner, "eval_quant", None)
    if eval_quant is not None:
        # quantized export (--int8): int8 kernels ride in params; the
        # calibrated scales stay f32 (the dequant epilogue computes in f32)
        variables["quant"] = eval_quant
    is_attn = opt.Prediction == "Attn"
    sos_id = getattr(learner.converter, "sos_id", 0)

    def infer(image):
        image = image.astype(dtype)
        if is_attn:
            text = jnp.full((image.shape[0], 1), sos_id, jnp.int32)
            out = learner._eval_logits(variables, image, text, "test")
        else:
            out = learner._eval_logits(variables, image, None, "test")
        return out.astype(jnp.float32)

    spec = jax.ShapeDtypeStruct(
        (batch_size, opt.imgH, opt.imgW, opt.input_channel), jnp.float32)
    exp = export.export(jax.jit(infer))(spec)
    return bytes(exp.serialize()), exp.out_avals


def main():
    if os.environ.get("MRN_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["MRN_TPU_PLATFORM"])
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--saved_model", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    parser.add_argument("--taski", type=int, default=None)
    parser.add_argument("--int8", action="store_true",
                        help="export the post-training w8a8 model "
                             "(mrn_tpu.ops.int8): calibrate on --calib_data "
                             "(default: the config's first valid_datas), "
                             "quantize, and serialize the int8 graph")
    parser.add_argument("--calib_data", default=None,
                        help="LMDB root whose <lan_list[0]> subdir feeds "
                             "int8 calibration")
    args = parser.parse_args()

    from mrn_tpu.config import load_config
    from evaluate_cli import load_learner

    opt = load_config(args.config)
    np.random.seed(opt.manual_seed)
    last_task = args.taski if args.taski is not None else len(opt.lan_list) - 1
    learner = load_learner(opt, args.saved_model, last_task)

    if args.int8:
        if opt.il in ("mrn", "der") and last_task > 0:
            parser.error("--int8 supports single-recognizer models (the "
                         "composite MRN/DER eval paths stay bf16)")
        from evaluate_cli import quantize_learner_int8
        from mrn_tpu.data.manager import ValDataset

        if not args.calib_data and not opt.get("valid_datas"):
            parser.error("--int8 needs calibration data: pass --calib_data "
                         "(the config has no valid_datas)")
        calib_root = args.calib_data or opt.valid_datas[0]
        calib_dir = os.path.join(calib_root, opt.lan_list[0])
        calib_loader = ValDataset([calib_dir], opt).create_dataset()
        quantize_learner_int8(learner, opt, calib_loader)
        print("# int8: calibrated + quantized (w8a8) before export")

    blob, out_avals = export_inference(learner, opt, args.batch_size,
                                       args.dtype)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob)} bytes, output {out_avals}")


if __name__ == "__main__":
    main()
