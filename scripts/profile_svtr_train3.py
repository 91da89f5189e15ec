"""Fine-grained SVTR bf16 train-step decomposition (round-5 perf session).

profile_svtr_train2 gives fwd / fwd+bwd / full-step totals; this script
breaks the fwd+bwd down to the individual pieces so the remaining train-step
cost (81.9 ms measured vs ~26 ms at inference efficiency) is attributable:

  - per-stage Block fwd and fwd+bwd, composed path vs fused train kernel
  - the attention core alone (banded Local / full Global), fwd and fwd+bwd
  - PatchEmbed (+BN) and SubSample convs, fwd+bwd
  - the 4500-class head: fc + log_softmax + CTC, fwd+bwd
  - Adam + global-norm clip on the real param tree

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_svtr_train3.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 256
DT = jnp.bfloat16


def timed(fn, *args, iters=10):
    out = None
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def bench_block(stage, dim, heads, hw, mixer, count, fused):
    """One Block at a stage geometry; returns (fwd ms, fwd+bwd ms)."""
    import os

    from mrn_tpu.models.svtr import Block

    prev = os.environ.get("MRN_FUSED_TRAIN")
    os.environ["MRN_FUSED_TRAIN"] = "1" if fused else "0"
    try:
        blk = Block(dim, heads, mixer, hw, drop_path=0.05, col_major=(mixer == "Local"))
        rng = jax.random.PRNGKey(0)
        n = hw[0] * hw[1]
        x = jax.random.normal(rng, (B, n, dim), DT)
        variables = blk.init({"params": rng, "droppath": rng}, x, True)
        params = jax.tree_util.tree_map(lambda t: t.astype(DT), variables["params"])

        @jax.jit
        def fwd(p, x):
            return blk.apply({"params": p}, x, True,
                             rngs={"droppath": rng}).astype(jnp.float32).sum()

        @jax.jit
        def fwd_bwd(p, x):
            return jax.grad(lambda q: blk.apply(
                {"params": q}, x, True,
                rngs={"droppath": rng}).astype(jnp.float32).sum())(p)

        f = timed(fwd, params, x)
        fb = timed(fwd_bwd, params, x)
        tag = "fused" if fused else "composed"
        print(f"stage{stage} {mixer:6s} dim{dim:4d} N{n:4d} x{count}  {tag:8s}"
              f"  fwd {f:6.2f} ms   fwd+bwd {fb:6.2f} ms"
              f"   (x{count}: {f*count:6.1f} / {fb*count:6.1f})")
        return f * count, fb * count
    finally:
        if prev is None:
            os.environ.pop("MRN_FUSED_TRAIN", None)
        else:
            os.environ["MRN_FUSED_TRAIN"] = prev


def bench_attn(stage, dim, heads, hw, mixer):
    """Attention core alone (q,k,v pre-made): fwd and fwd+bwd."""
    from mrn_tpu.models.svtr import _attention_core, local_attention_mask_col_major

    n = hw[0] * hw[1]
    d = dim // heads
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, heads, n, d), DT)
    band = None
    mask = None
    if mixer == "Local":
        band = (hw[0], hw[1], 7, 11)
        mask = local_attention_mask_col_major(*band)

    @jax.jit
    def fwd(q):
        return _attention_core(q, q, q, mask, band=band).astype(jnp.float32).sum()

    @jax.jit
    def fwd_bwd(q):
        return jax.grad(lambda t: _attention_core(
            t, t, t, mask, band=band).astype(jnp.float32).sum())(q)

    f = timed(fwd, q)
    fb = timed(fwd_bwd, q)
    print(f"stage{stage} {mixer:6s} attention core        "
          f"  fwd {f:6.2f} ms   fwd+bwd {fb:6.2f} ms")


def bench_head():
    """fc (256->4500) + log_softmax + CTC over [B, 64] frames."""
    from mrn_tpu.ops.ctc import ctc_loss

    rng = jax.random.PRNGKey(0)
    feat = jax.random.normal(rng, (B, 64, 256), DT)
    w = jax.random.normal(rng, (256, 4500), DT) * 0.02
    label = jnp.ones((B, 25), jnp.int32)
    length = jnp.full((B,), 5, jnp.int32)

    @jax.jit
    def fwd(w, feat):
        return ctc_loss((feat @ w).astype(jnp.float32), label, length)

    @jax.jit
    def fwd_bwd(w, feat):
        return jax.grad(lambda q: ctc_loss(
            (feat @ q).astype(jnp.float32), label, length))(w)

    print(f"head fc+CTC (4500 cls)                "
          f"  fwd {timed(fwd, w, feat):6.2f} ms"
          f"   fwd+bwd {timed(fwd_bwd, w, feat):6.2f} ms")


def bench_stem():
    """PatchEmbed (+BN, train mode) and the three SubSample convs."""
    from mrn_tpu.models.svtr import PatchEmbed, SubSampleConv

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (B, 32, 256, 4), DT)
    pe = PatchEmbed(64)
    v = pe.init(rng, img, True)

    @jax.jit
    def pe_fb(p, img):
        def loss(q):
            out, _ = pe.apply({"params": q, "batch_stats": v["batch_stats"]},
                              img, True, mutable=["batch_stats"])
            return out.astype(jnp.float32).sum()
        return jax.grad(loss)(p)

    print(f"patch embed fwd+bwd                   "
          f"        {timed(pe_fb, v['params'], img):6.2f} ms")

    for (hw, cin, cout) in (((8, 64), 64, 128), ((4, 64), 128, 256),
                            ((2, 64), 256, 512)):
        ss = SubSampleConv(cout, hw)
        x = jax.random.normal(rng, (B, hw[0] * hw[1], cin), DT)
        vv = ss.init(rng, x)

        @jax.jit
        def ss_fb(p, x, ss=ss):
            return jax.grad(lambda q: ss.apply(
                {"params": q}, x).astype(jnp.float32).sum())(p)

        print(f"subsample {hw} {cin}->{cout} fwd+bwd      "
              f"      {timed(ss_fb, vv['params'], x):6.2f} ms")


def main():
    print(f"backend: {jax.default_backend()}  B={B}  {DT.__name__}")
    stages = [
        # (stage, dim, heads, hw, [(mixer, count)])
        (1, 64, 2, (8, 64), [("Local", 3)]),
        (2, 128, 4, (4, 64), [("Local", 3), ("Global", 3)]),
        (3, 256, 8, (2, 64), [("Global", 3)]),
    ]
    tot_f = tot_fb = 0.0
    for fused in (False, True):
        print(f"--- blocks ({'fused train kernel' if fused else 'composed'}) ---")
        tot_f = tot_fb = 0.0
        for stage, dim, heads, hw, mixers in stages:
            for mixer, count in mixers:
                f, fb = bench_block(stage, dim, heads, hw, mixer, count, fused)
                tot_f += f
                tot_fb += fb
        print(f"all 12 blocks                 fwd {tot_f:6.1f} ms"
              f"   fwd+bwd {tot_fb:6.1f} ms")
    print("--- attention cores (composed path) ---")
    for stage, dim, heads, hw, mixers in stages:
        for mixer, _ in mixers:
            bench_attn(stage, dim, heads, hw, mixer)
    print("--- stem / head ---")
    bench_stem()
    bench_head()


if __name__ == "__main__":
    main()
