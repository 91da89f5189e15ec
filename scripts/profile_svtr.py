"""Stage-level profiling of the SVTR inference path (bench support tool)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.config import default_options
from mrn_tpu.models.svtr import Block, PatchEmbed, SubSampleConv
from mrn_tpu.models.composer import build_recognizer

B = 256
DTYPE = jnp.bfloat16


def bench_fn(fn, *args, iters=20, warmup=3):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def cast(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(DTYPE) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def stage(name, module, x, **kw):
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng, "droppath": rng}, x, **kw)
    variables = cast(variables)
    ms = bench_fn(lambda xx: module.apply(variables, xx, **kw), x)
    print(f"{name:28s} {ms:8.2f} ms  ({B / ms * 1000:,.0f} crops/s)")
    out = module.apply(variables, x, **kw)
    return out


def main():
    x = jnp.zeros((B, 32, 256, 4), DTYPE)
    print(f"batch {B}, dtype {DTYPE.__name__}")

    pe = PatchEmbed(64)
    x1 = stage("patch_embed", pe, x, train=False)

    blk1 = Block(64, 2, "Local", (8, 64), drop_path=0.0)
    h = stage("block1 (Local, d64, N512)", blk1, x1, train=False)
    ss1 = SubSampleConv(128, (8, 64))
    x2 = stage("sub_sample1", ss1, h)

    blk2l = Block(128, 4, "Local", (4, 64), drop_path=0.0)
    stage("block2 (Local, d128, N256)", blk2l, x2, train=False)
    blk2g = Block(128, 4, "Global", (4, 64), drop_path=0.0)
    h2 = stage("block2 (Global)", blk2g, x2, train=False)
    ss2 = SubSampleConv(256, (4, 64))
    x3 = stage("sub_sample2", ss2, h2)

    blk3 = Block(256, 8, "Global", (2, 64), drop_path=0.0)
    h3 = stage("block3 (Global, d256, N128)", blk3, x3, train=False)
    ss3 = SubSampleConv(512, (2, 64))
    stage("sub_sample3", ss3, h3)

    # full model
    opt = default_options(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC")
    model = build_recognizer(opt, 4500)
    rng = jax.random.PRNGKey(0)
    variables = cast(model.init({"params": rng, "droppath": rng},
                                x.astype(jnp.float32), train=False))
    ms = bench_fn(lambda xx: jnp.argmax(
        model.apply(variables, xx, train=False)["predict"], 2), x)
    print(f"{'FULL model':28s} {ms:8.2f} ms  ({B / ms * 1000:,.0f} crops/s)")


if __name__ == "__main__":
    main()
