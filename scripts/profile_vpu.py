"""Microbenchmarks of the VPU-serial pieces of the fused SVTR block
(softmax / exp / erf-GELU / LayerNorm) on the live chip — evidence base for
the round-4 MFU attack (VERDICT r3 #1).  Plain XLA ops on block-kernel-shaped
tensors: relative costs transfer to the Pallas kernel, absolute don't.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# stage-1-shaped score tensor per bs-256 slice: 256 img x 2 heads of [512,512]
SCORES = (64, 512, 512)    # [GH, N, N] slice
GELU_SHAPE = (64 * 512, 256)

_EXP2_COEFS = (1.4142136363070548, 0.4901290855252041, 0.08493134406079463,
               0.009811708830638574, 0.0008547828200669754,
               5.9199335127137494e-05)
_LOG2E = 1.4426950408889634


def poly_exp(x):
    """exp(x) for x <= 0 (softmax-safe): clamp, split 2^k * 2^r, poly 2^r,
    scale via exponent-bit bitcast.  All FMA/int ops, no transcendental."""
    y = jnp.maximum(x * _LOG2E, -40.0)
    k = jnp.floor(y)
    r = y - k                      # [0, 1)
    u = 2.0 * r - 1.0
    p = _EXP2_COEFS[-1]
    for c in _EXP2_COEFS[-2::-1]:
        p = p * u + c
    scale = jax.lax.bitcast_convert_type(
        ((k.astype(jnp.int32) + 127) << 23), jnp.float32)
    return p * scale


def softmax_ref(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def softmax_recip(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))


def softmax_poly(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = poly_exp(s - m)
    return p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))


_ERF_Z0SQ = 3.7 * 3.7
_ERF16 = (
    0.3821374773979187, -0.1904679834842682, 0.14079536497592926,
    -0.11263926327228546, 0.09052307158708572, -0.07047279179096222,
    0.0521380715072155, -0.03618001565337181, 0.023104503750801086,
    -0.013829714618623257, 0.008435077033936977, -0.004555193707346916,
    0.0014333085855469108, -0.0005751904682256281, 0.0007578228251077235,
    -0.0003343276330269873)
_ERF10 = (0.3821355692428971, -0.19055508189784076, 0.14092998805298707,
          -0.11093842740955455, 0.08899182434931227, -0.07966641890469066,
          0.05841939925101248, -0.01634733790922132, 0.011799752703520098,
          -0.0315383465491275, 0.017046074866209553)


def gelu_poly(x, coefs):
    z = x * (2.0 ** -0.5)
    u = (2.0 / _ERF_Z0SQ) * jnp.minimum(z * z, _ERF_Z0SQ) - 1.0
    p = coefs[-1]
    for c in coefs[-2::-1]:
        p = p * u + c
    return 0.5 * x * (1.0 + jnp.clip(z * p, -1.0, 1.0))


def bench(name, fn, *args, iters=30):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:32s} {dt:8.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, SCORES, jnp.float32) * 4.0
    g = jax.random.normal(key, GELU_SHAPE, jnp.float32)

    # numeric checks first
    ref = softmax_ref(s[:2])
    for nm, fn in (("recip", softmax_recip), ("poly", softmax_poly)):
        err = float(jnp.max(jnp.abs(fn(s[:2]) - ref)))
        print(f"# softmax_{nm} max abs err vs ref: {err:.2e}")
    import math
    zs = jnp.linspace(-6, 6, 100001)
    e16 = gelu_poly(zs, _ERF16)
    e10 = gelu_poly(zs, _ERF10)
    exact = jnp.asarray([0.5 * z * (1 + math.erf(z / math.sqrt(2)))
                         for z in np.asarray(zs)])
    print(f"# gelu erf16 maxerr {float(jnp.max(jnp.abs(e16-exact))):.2e}; "
          f"erf10 maxerr {float(jnp.max(jnp.abs(e10-exact))):.2e}")

    bench("exp (hw)", lambda x: jnp.exp(x), s)
    bench("exp (poly2^r)", poly_exp, s)
    bench("softmax ref (div)", softmax_ref, s)
    bench("softmax recip-mult", softmax_recip, s)
    bench("softmax poly-exp", softmax_poly, s)
    bench("gelu erf16", lambda x: gelu_poly(x, _ERF16), g)
    bench("gelu erf10", lambda x: gelu_poly(x, _ERF10), g)
    bench("gelu tanh (jax)", lambda x: jax.nn.gelu(x, approximate=True), g)
    bench("gelu exact (jax erf)", lambda x: jax.nn.gelu(x, approximate=False), g)

    # LayerNorm vs folded variant cost
    x = jax.random.normal(key, (64 * 512, 256), jnp.float32)
    sc = jnp.ones((256,)); b = jnp.zeros((256,))

    def ln(x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        return (x - mean) * jax.lax.rsqrt(var + 1e-6) * sc + b

    def ln_nofold(x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        return (x - mean) * jax.lax.rsqrt(var + 1e-6)

    bench("layernorm scale+shift", ln, x)
    bench("layernorm bare", ln_nofold, x)


if __name__ == "__main__":
    main()
