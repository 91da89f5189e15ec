"""TRBA sub-stage profile: TPS (localization vs grid-sample), ResNet, BiLSTM."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.models.lstm import BidirectionalLSTM
from mrn_tpu.models.resnet import ResNetExtractor
from mrn_tpu.models.tps import TPSTransformer, LocalizationNetwork
from mrn_tpu.ops.grid_sample import grid_sample, grid_sample_matmul

B = 256
DT = jnp.bfloat16


def bench(fn, *args, iters=10):
    jfn = jax.jit(fn)
    for _ in range(2):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jfn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


def cast(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(DT) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree)


def main():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, 32, 256, 4), DT)

    tps = TPSTransformer(20, (32, 256))
    v = cast(tps.init({"params": rng}, x.astype(jnp.float32), train=False))
    print(f"TPS full:      {bench(lambda a: tps.apply(v, a, train=False), x):8.2f} ms")

    loc = LocalizationNetwork(20)
    vl = cast(loc.init({"params": rng}, x.astype(jnp.float32), train=False))
    print(f"TPS loc-net:   {bench(lambda a: loc.apply(vl, a, train=False), x):8.2f} ms")

    grid = jnp.zeros((B, 32, 256, 2), DT)
    print(f"grid gather:   {bench(grid_sample, x, grid):8.2f} ms")
    print(f"grid matmul:   {bench(lambda a, g: grid_sample_matmul(a, g, row_block=4), x, grid):8.2f} ms")
    from mrn_tpu.ops.grid_sample import grid_sample_pallas
    for rb, bb in ((4, 8), (8, 8), (4, 16)):
        try:
            ms = bench(lambda a, g, rb=rb, bb=bb: grid_sample_pallas(
                a, g, row_block=rb, batch_block=bb), x, grid)
            print(f"grid pallas rb{rb} bb{bb}: {ms:8.2f} ms")
        except Exception as e:
            print(f"grid pallas rb{rb} bb{bb}: FAILED {type(e).__name__}: {e}")

    res = ResNetExtractor(512)
    vr = cast(res.init({"params": rng}, x.astype(jnp.float32), train=False))
    print(f"ResNet:        {bench(lambda a: res.apply(vr, a, train=False), x):8.2f} ms")

    seq = jnp.zeros((B, 65, 512), DT)
    lstm = BidirectionalLSTM(256, 256)
    vs = cast(lstm.init(rng, seq.astype(jnp.float32)))
    print(f"BiLSTM(512->): {bench(lambda s: lstm.apply(vs, s), seq):8.2f} ms")

    # Attn greedy decode stage (26 steps, 4500-class generator)
    from mrn_tpu.models.attention import AttentionDecoder
    from mrn_tpu.models.common import TorchDense

    n_cls = 4500
    feat = jnp.zeros((B, 65, 256), DT)
    dec = AttentionDecoder(input_size=256, hidden_size=256, num_classes=n_cls,
                           generator=TorchDense(n_cls, name="gen"),
                           batch_max_length=25)
    sos = jnp.zeros((B, 1), jnp.int32)
    vd = cast(dec.init(rng, feat.astype(jnp.float32), sos, is_train=False))
    print(f"Attn greedy:   "
          f"{bench(lambda f: dec.apply(vd, f, sos, is_train=False), feat):8.2f} ms")

    # full TRBA at several batch sizes
    from mrn_tpu.config import default_options
    from mrn_tpu.models.composer import build_recognizer

    opt = default_options(Transformation="TPS", FeatureExtraction="ResNet",
                          SequenceModeling="BiLSTM", Prediction="Attn")
    model = build_recognizer(opt, n_cls)
    for bs in (256, 512):
        img = jnp.zeros((bs, 32, 256, 4), DT)
        text = jnp.zeros((bs, 1), jnp.int32)
        vm = cast(model.init({"params": rng, "droppath": rng},
                             img.astype(jnp.float32), train=False, text=text))
        ms = bench(lambda a: model.apply(vm, a, train=False, is_train=False,
                                         text=text)["predict"], img, iters=5)
        print(f"TRBA full bs{bs}: {ms:8.2f} ms ({bs / ms * 1000:,.0f} crops/s)")


if __name__ == "__main__":
    main()
