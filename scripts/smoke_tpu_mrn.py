"""TPU smoke: MRNNet routed forward (train soft-routing + eval hard-routing)
with stacked experts — exercises the pallas kernels under nn.vmap on real
hardware; plus a TRBA stage profile."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.config import default_options
from mrn_tpu.models.mrn import MRNNet
from mrn_tpu.models.composer import build_recognizer


def bench(fn, *args, iters=10):
    jfn = jax.jit(fn)
    for _ in range(2):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jfn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B = 64
    opt = default_options(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC")
    net = MRNNet(n_experts=3, num_classes=3000, class_counts=(1000, 2000, 3000),
                 prediction="CTC", feature_extraction="SVTR",
                 sequence_modeling="None", output_channel=512, hidden_size=256)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, 32, 256, 4), jnp.float32)
    t0 = time.time()
    variables = net.init({"params": rng, "droppath": rng}, x, train=False,
                         is_train=True)
    print(f"init done in {time.time() - t0:.1f}s")
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    xb = x.astype(jnp.bfloat16)

    ms = bench(lambda xx: net.apply(variables, xx, cross=True, train=False,
                                    is_train=False)["logits"], xb)
    print(f"MRN routed eval (3 experts, TF): {ms:.2f} ms "
          f"({B / ms * 1000:,.0f} crops/s)")

    # TRBA stage profile
    opt = default_options(Transformation="TPS", FeatureExtraction="ResNet",
                          SequenceModeling="BiLSTM", Prediction="Attn")
    model = build_recognizer(opt, 4500)
    x = jnp.zeros((256, 32, 256, 4), jnp.float32)
    text = jnp.zeros((256, 1), jnp.int32)
    variables = model.init({"params": rng}, x, text=text, train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    xb = x.astype(jnp.bfloat16)

    ms = bench(lambda xx: model.apply(variables, xx, train=False,
                                      method=model.features_only), xb)
    print(f"TRBA backbone (TPS+ResNet+BiLSTM): {ms:.2f} ms "
          f"({256 / ms * 1000:,.0f} crops/s)")
    ms = bench(lambda xx: model.apply(variables, xx, text=text, train=False,
                                      is_train=False)["predict"], xb)
    print(f"TRBA full (greedy 26-step decode): {ms:.2f} ms "
          f"({256 / ms * 1000:,.0f} crops/s)")


if __name__ == "__main__":
    main()
