"""Headline benchmark: SVTR inference throughput (32x256 crops/sec/chip).

Target (BASELINE.md north star): >= 10,000 crops/sec/chip on TPU v5e.
Prints the headline as ONE JSON line {"metric", "value", "unit",
"vs_baseline"} IMMEDIATELY after the batch sweep, then one JSON line per
secondary AS IT COMPLETES ({"secondary", "value", "unit", ...}) — a driver
timeout mid-secondaries voids only the rows not yet printed (VERDICT r4 #6:
BENCH_r04's single 900s budget died before the CRNN/TRBA/int8 rows).

Runs the flagship SVTR recognizer (None+SVTR+None+CTC, output_channel 512,
~4.5k-class head) in bfloat16 eval mode, sweeping batch sizes and reporting
the best steady-state throughput.
"""

import json
import os
import subprocess
import sys
import time

# The axon TPU tunnel can die mid-session, after which the FIRST jax device
# call blocks forever (no timeout in the client).  Probe device init in a
# bounded subprocess so the bench fails fast with a diagnosis instead of
# hanging the driver.
if os.environ.get("MRN_TPU_BENCH_PROBED") != "1":
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            env=dict(os.environ, MRN_TPU_BENCH_PROBED="1"),
            timeout=300, capture_output=True, text=True)
        failed = probe.returncode != 0
        detail = (probe.stderr or "")[-500:]
    except subprocess.TimeoutExpired:
        failed, detail = True, "device init exceeded 300s (hung tunnel)"
    if failed:
        print(f"# TPU unreachable: {detail}", file=sys.stderr)
        print("# The axon tunnel relay (/root/.tpu_init.py) is likely dead "
              "— bench requires the live chip.", file=sys.stderr)
        sys.exit(3)

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer

BASELINE_CROPS_PER_SEC = 10000.0
NUM_CLASSES = 4500


def _emit(label, value, unit, **extra):
    """Human line on stderr + machine-parseable line on stdout, flushed
    immediately so every completed row survives a driver timeout."""
    print(f"# {label}: {value:,.1f} {unit}"
          + (f" {extra}" if extra else ""), file=sys.stderr, flush=True)
    print(json.dumps(dict({"secondary": label, "value": round(value, 1),
                           "unit": unit}, **extra)), flush=True)


def build(batch_size: int, dtype=jnp.bfloat16):
    opt = default_options(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC")
    model = build_recognizer(opt, NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((batch_size, opt.imgH, opt.imgW, opt.input_channel),
                      jnp.float32)
    variables = model.init({"params": rng, "droppath": rng}, image, train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables)

    # token-chained step: each call consumes the previous result ON DEVICE, so
    # the timing loop is serialized without per-call host round-trips (the
    # tunneled backend makes both naive pipelining and per-call blocking
    # unreliable).
    @jax.jit
    def infer(image, token):
        out = model.apply(variables, (image + token).astype(dtype), train=False)
        pred = jnp.argmax(out["predict"], axis=2).astype(jnp.int32)
        return pred, (pred[0, 0] * 0).astype(image.dtype)

    return infer, image


def measure(batch_size: int, warmup: int = 3, iters: int = 20) -> float:
    infer, image = build(batch_size)
    image = jax.device_put(image)
    token = jnp.asarray(0.0, image.dtype)
    for _ in range(warmup):
        pred, token = infer(image, token)
    jax.block_until_ready(pred)
    t0 = time.perf_counter()
    for _ in range(iters):
        pred, token = infer(image, token)
    jax.block_until_ready(pred)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _secondary_arch(name, overrides, batch_size=256, int8=False):
    """CRNN / TRBA / SVTR inference throughput rows.  ``int8``: post-training
    w8a8 conv/projection path (mrn_tpu.ops.int8) — the ~2x MXU lever on the
    compute-bound TRBA ResNet."""
    opt = default_options(**overrides)
    model = build_recognizer(opt, NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((batch_size, opt.imgH, opt.imgW, opt.input_channel),
                      jnp.float32)
    kw = {}
    if opt.Prediction == "Attn":
        kw["text"] = jnp.zeros((batch_size, 1), jnp.int32)
    variables = model.init({"params": rng, "droppath": rng}, image,
                           train=False, **kw)
    if int8:
        from mrn_tpu.ops.int8 import quantize_variables
        name = f"{name}-int8"
        calib = build_recognizer(opt, NUM_CLASSES, quant="calib")
        calib_img = jax.random.normal(rng, image.shape, jnp.float32)
        _, upd = calib.apply(variables, calib_img, train=False,
                             is_train=False, mutable=["quant"], **kw)
        variables = quantize_variables(dict(variables, quant=upd["quant"]))
        model = build_recognizer(opt, NUM_CLASSES, quant="int8")
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)

    @jax.jit
    def infer(image, token):
        out = model.apply(variables, (image + token).astype(jnp.bfloat16),
                          train=False, is_train=False, **kw)
        pred = jnp.argmax(out["predict"], axis=2).astype(jnp.int32)
        return pred, (pred[0, 0] * 0).astype(image.dtype)

    image = jax.device_put(image)
    token = jnp.asarray(0.0, image.dtype)
    for _ in range(2):
        pred, token = infer(image, token)
    jax.block_until_ready(pred)
    t0 = time.perf_counter()
    for _ in range(10):
        pred, token = infer(image, token)
    jax.block_until_ready(pred)
    tput = batch_size * 10 / (time.perf_counter() - t0)
    _emit(f"{name} infer bs{batch_size}", tput, "crops/s")


def _train_step_bench(arch="CRNN", batch_size=256, dtype=None,
                      overrides=None, fused=False):
    """Full train-step rows (fwd+CTC+bwd+clip+Adam).  The SVTR bf16 row is
    the VERDICT r4 #2 target metric: the round-5 training path runs banded
    local attention + banded XLA backward + degree-15 erf-poly GELU.
    ``fused=True`` additionally routes every SVTR block through the fused
    training kernel + residual-saving custom VJP
    (ops/svtr_train_block.fused_block_train) via MRN_FUSED_TRAIN=1, read at
    trace time inside Block.__call__."""
    import optax
    from mrn_tpu.ops.ctc import ctc_loss
    from mrn_tpu.ops.schedules import onecycle_schedule

    prev_fused = os.environ.get("MRN_FUSED_TRAIN")
    if fused:
        os.environ["MRN_FUSED_TRAIN"] = "1"

    overrides = overrides or dict(
        Transformation="None", FeatureExtraction="VGG",
        SequenceModeling="BiLSTM", Prediction="CTC")
    opt = default_options(**overrides)
    model = build_recognizer(opt, NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((batch_size, opt.imgH, opt.imgW, opt.input_channel),
                      jnp.float32)
    variables = model.init({"params": rng, "droppath": rng}, image, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    if dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(onecycle_schedule(5e-4, 10000)))
    opt_state = tx.init(params)
    label = jnp.ones((batch_size, 25), jnp.int32)
    length = jnp.full((batch_size,), 5, jnp.int32)
    cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)

    @jax.jit
    def step(params, stats, opt_state, image):
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": stats},
                                   cast(image),
                                   train=True, mutable=["batch_stats"],
                                   rngs={"droppath": rng})
            return (ctc_loss(out["predict"].astype(jnp.float32), label,
                             length), mut["batch_stats"])
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    try:
        for _ in range(2):
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  image)
            jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(10):
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  image)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / 10
    finally:
        if fused:
            if prev_fused is None:
                os.environ.pop("MRN_FUSED_TRAIN", None)
            else:
                os.environ["MRN_FUSED_TRAIN"] = prev_fused
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    if fused:
        tag += " fused"
    _emit(f"{arch} train step bs{batch_size} {tag}", dt * 1000, "ms",
          imgs_per_s=round(batch_size / dt, 1))


def _mrn_serving_bench(batch_size=256, n_experts=6):
    """MRN 6-expert TF-routed eval throughput — the paper's deployed
    configuration (modules/model.py:366-395): all experts forward (vmapped),
    DM-Router scores, hard argmax expert pick per sample."""
    from mrn_tpu.models.mrn import MRNNet

    opt = default_options(Transformation="None", FeatureExtraction="VGG",
                          SequenceModeling="BiLSTM", Prediction="CTC")
    # MLT17-like cumulative class counts (BASELINE.md per-task classes)
    counts = tuple(np.cumsum([1895, 325, 1620, 1124, 73, 112])[:n_experts]
                   + 4)  # +4 specials
    model = MRNNet(n_experts=n_experts, num_classes=int(counts[-1]),
                   class_counts=tuple(int(c) for c in counts),
                   prediction="CTC", transformation=opt.Transformation,
                   feature_extraction=opt.FeatureExtraction,
                   sequence_modeling=opt.SequenceModeling,
                   output_channel=opt.output_channel,
                   hidden_size=opt.hidden_size,
                   img_size=(opt.imgH, opt.imgW))
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((batch_size, opt.imgH, opt.imgW, opt.input_channel),
                      jnp.float32)
    variables = model.init({"params": rng, "droppath": rng}, image,
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)

    @jax.jit
    def infer(image, token):
        out = model.apply(variables, (image + token).astype(jnp.bfloat16),
                          train=False, is_train=False)
        pred = jnp.argmax(out["logits"], axis=2).astype(jnp.int32)
        return pred, (pred[0, 0] * 0).astype(image.dtype)

    image = jax.device_put(image)
    token = jnp.asarray(0.0, image.dtype)
    for _ in range(2):
        pred, token = infer(image, token)
    jax.block_until_ready(pred)
    t0 = time.perf_counter()
    for _ in range(10):
        pred, token = infer(image, token)
    jax.block_until_ready(pred)
    tput = batch_size * 10 / (time.perf_counter() - t0)
    _emit(f"MRN serving 6-expert CRNN TF bs{batch_size}", tput, "crops/s")


def _gelu15_parity_check(batch_size=1024):
    """Headline-integrity check: the default fused kernel runs the degree-9
    minimax erf (|erf err| < 1.4e-4 — below the bf16 cast noise of the MLP
    hidden); this measures the degree-15 reference path's throughput and the
    argmax agreement between the two on one random batch.  Random init +
    noise inputs produce near-tied logits, so agreement here UNDERSTATES
    trained-model agreement; the trained-checkpoint word-accuracy delta is
    measured by evaluate_cli (PARITY.md gelu9 row)."""
    infer9, image = build(batch_size)
    rng_img = jax.random.normal(jax.random.PRNGKey(3), image.shape,
                                jnp.float32)
    token = jnp.asarray(0.0, rng_img.dtype)
    pred9, _ = infer9(rng_img, token)
    os.environ["SVTR_GELU_DEG"] = "15"
    try:
        infer15, _ = build(batch_size)
        pred15, _ = infer15(rng_img, token)
        agree = float(jnp.mean((pred9 == pred15).astype(jnp.float32)))
        for _ in range(2):
            pred, token = infer15(rng_img, token)
        jax.block_until_ready(pred)
        t0 = time.perf_counter()
        for _ in range(10):
            pred, token = infer15(rng_img, token)
        jax.block_until_ready(pred)
        tput = batch_size * 10 / (time.perf_counter() - t0)
        _emit(f"SVTR deg-15 erf bs{batch_size}", tput, "crops/s",
              argmax_agreement_vs_deg9=round(agree, 4))
    finally:
        os.environ.pop("SVTR_GELU_DEG", None)


def _gelu_serving_check(batch_size=512):
    """Serving-mode lever: tanh-approx GELU (exact erf costs ~20% of SVTR
    inference on the VPU).  Reports throughput + argmax agreement vs the
    exact-erf path on one random batch (logit delta documented <1e-3)."""
    from mrn_tpu.models import svtr as svtr_mod

    infer, image = build(batch_size)
    rng_img = jax.random.normal(jax.random.PRNGKey(3), image.shape,
                                jnp.float32)
    token = jnp.asarray(0.0, rng_img.dtype)
    exact_pred, _ = infer(rng_img, token)
    svtr_mod.set_gelu_approximate(True)
    try:
        infer_a, _ = build(batch_size)
        approx_pred, _ = infer_a(rng_img, token)
        agree = float(jnp.mean((exact_pred == approx_pred).astype(jnp.float32)))
        for _ in range(2):
            pred, token = infer_a(rng_img, token)
        jax.block_until_ready(pred)
        t0 = time.perf_counter()
        for _ in range(10):
            pred, token = infer_a(rng_img, token)
        jax.block_until_ready(pred)
        tput = batch_size * 10 / (time.perf_counter() - t0)
        _emit(f"SVTR gelu-approx bs{batch_size}", tput, "crops/s",
              argmax_agreement_vs_erf=round(agree, 4))
    finally:
        svtr_mod.set_gelu_approximate(False)


def main():
    t_start = time.perf_counter()
    best = 0.0
    best_bs = 0
    # bs 2048 has been the sweep winner every round (r2-r4) with 512 within
    # 1%; the 1024/256 points never won and cost ~2 compiles of the secondary
    # budget — dropped (VERDICT r4 #6).
    for bs in (2048, 512):
        try:
            tput = measure(bs)
        except Exception as e:  # OOM etc.
            print(f"# batch {bs} failed: {e}", file=sys.stderr)
            continue
        print(f"# batch {bs}: {tput:,.0f} crops/s", file=sys.stderr,
              flush=True)
        if tput > best:
            best, best_bs = tput, bs
    # Print the parseable headline JSON IMMEDIATELY after the sweep, before
    # any secondary benches — a driver timeout mid-secondaries must not void
    # the round's official number (BENCH_r03 was rc=124/parsed=null because
    # this line used to come last).
    print(json.dumps({
        "metric": f"svtr_infer_crops_per_sec_bs{best_bs}",
        "value": round(best, 1),
        "unit": "crops/s",
        "vs_baseline": round(best / BASELINE_CROPS_PER_SEC, 3),
    }), flush=True)
    # Secondaries, each emitting its own stdout JSON line on completion and
    # gated on the remaining budget so a slow one can't starve the rest.
    # Ordered README-table-first: every README perf row lands before the
    # informational gelu checks.
    SECONDARY_BUDGET_S = float(os.environ.get("MRN_BENCH_BUDGET_S", "2700"))
    _CRNN = dict(Transformation="None", FeatureExtraction="VGG",
                 SequenceModeling="BiLSTM", Prediction="CTC")
    _TRBA = dict(Transformation="TPS", FeatureExtraction="ResNet",
                 SequenceModeling="BiLSTM", Prediction="Attn")
    _SVTR = dict(Transformation="None", FeatureExtraction="SVTR",
                 SequenceModeling="None", Prediction="CTC")

    def _svtr_int8_attn(batch_size):
        # int8 attention matmuls on top of the int8 projections
        from mrn_tpu.models import svtr as svtr_mod
        svtr_mod.set_attention_int8(True)
        try:
            _secondary_arch("SVTR+attn", _SVTR, batch_size=batch_size,
                            int8=True)
        finally:
            svtr_mod.set_attention_int8(False)

    secondaries = [
        # README perf-table rows first (VERDICT r4 #6)
        ("CRNN", _secondary_arch, ("CRNN", _CRNN), {}),
        ("TRBA bs256", _secondary_arch, ("TRBA", _TRBA), {}),
        ("TRBA int8", _secondary_arch, ("TRBA", _TRBA),
         dict(batch_size=512, int8=True)),
        ("CRNN int8", _secondary_arch, ("CRNN", _CRNN),
         dict(batch_size=256, int8=True)),
        # w8a8 SVTR: block projections (~79% of FLOPs) on the int8 MXU
        # via the fused Pallas kernel (ops/svtr_block._make_kernel_int8)
        ("SVTR int8 bs512", _secondary_arch, ("SVTR", _SVTR),
         dict(batch_size=512, int8=True)),
        ("SVTR int8+attn bs512", _svtr_int8_attn, (),
         dict(batch_size=512)),
        ("MRN serving", _mrn_serving_bench, (), {}),
        ("SVTR train-step bf16", _train_step_bench,
         ("SVTR",), dict(dtype=jnp.bfloat16, overrides=_SVTR)),
        ("SVTR train-step fused bf16", _train_step_bench,
         ("SVTR",), dict(dtype=jnp.bfloat16, overrides=_SVTR, fused=True)),
        ("CRNN train-step", _train_step_bench, ("CRNN",), {}),
        # informational checks last
        ("SVTR int8 bs1024", _secondary_arch, ("SVTR", _SVTR),
         dict(batch_size=1024, int8=True)),
        # TRBA batch scaling: the BiLSTM/decoder scans are latency-bound at
        # bs256 (65+26 sequential steps), so larger batches amortize the
        # per-step overhead on top of the int8 conv win
        ("TRBA int8 bs1024", _secondary_arch, ("TRBA", _TRBA),
         dict(batch_size=1024, int8=True)),
        ("gelu15-parity", _gelu15_parity_check, (), {}),
        ("gelu-approx", _gelu_serving_check, (), {}),
    ]
    for label, fn, fargs, fkw in secondaries:
        if time.perf_counter() - t_start > SECONDARY_BUDGET_S:
            print(f"# secondary budget exhausted before {label}",
                  file=sys.stderr)
            break
        try:
            fn(*fargs, **fkw)
        except Exception as e:
            print(f"# secondary bench {label} failed: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
