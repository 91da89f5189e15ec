import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mrn_tpu.models.svtr as svtr_mod
from mrn_tpu.models.svtr import Block, local_attention_mask
from mrn_tpu.ops.svtr_block import fused_block


@pytest.fixture(autouse=True)
def xla_impl():
    svtr_mod.set_attention_impl("xla")
    yield
    svtr_mod.set_attention_impl("auto")


@pytest.mark.parametrize("mixer,heads,hw", [("Global", 2, (4, 8)),
                                            ("Local", 4, (4, 8))])
def test_fused_block_matches_composed(rng, mixer, heads, hw, monkeypatch):
    """With the degree-15 erf selected, the fused kernel matches the
    composed block to f32 noise — the only algorithmic deltas left are the
    reduction-free softmax (exp without max-subtract + MXU ones-column
    row-sum), which is exact-softmax-equivalent up to f32 rounding."""
    monkeypatch.setenv("SVTR_GELU_DEG", "15")
    n = hw[0] * hw[1]
    c = 32
    block = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0)
    x = jnp.asarray(rng.normal(size=(3, n, c)).astype(np.float32))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = block.apply(variables, x, train=False)

    mask = local_attention_mask(*hw) if mixer == "Local" else None
    scale = (c // heads) ** -0.5
    fused = fused_block(x, variables["params"], mask, heads, scale,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mixer,heads,hw", [("Global", 2, (4, 8)),
                                            ("Local", 4, (4, 8))])
def test_fused_block_deg9_gelu_close(rng, mixer, heads, hw):
    """The default (degree-9 erf) fused kernel stays within the documented
    GELU error envelope of the composed exact-erf block — well inside the
    bf16 cast noise the serving path applies anyway."""
    n = hw[0] * hw[1]
    c = 32
    block = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0)
    x = jnp.asarray(rng.normal(size=(3, n, c)).astype(np.float32))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = block.apply(variables, x, train=False)

    mask = local_attention_mask(*hw) if mixer == "Local" else None
    scale = (c // heads) ** -0.5
    fused = fused_block(x, variables["params"], mask, heads, scale,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("mixer,heads,hw", [("Global", 2, (4, 8)),
                                            ("Local", 4, (4, 8))])
def test_fused_block_int8_matches_composed_int8(rng, mixer, heads, hw):
    """w8a8 fused kernel == w8a8 composed path (same quantized operands,
    so they differ only by f32 summation order)."""
    from mrn_tpu.ops.int8 import quantize_variables

    n = hw[0] * hw[1]
    c = 32
    block = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0)
    x = jnp.asarray(rng.normal(size=(3, n, c)).astype(np.float32))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    calib = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0,
                  quant="calib")
    _, upd = calib.apply(variables, x, train=False, mutable=["quant"])
    qv = quantize_variables(dict(variables, quant=upd["quant"]))

    i8 = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0,
               quant="int8")
    ref = i8.apply(qv, x, train=False)  # composed (xla impl fixture)

    mask = local_attention_mask(*hw) if mixer == "Local" else None
    scale = (c // heads) ** -0.5
    block_quant = jax.tree_util.tree_leaves_with_path(qv["quant"])
    flat_quant = {p[-1].key: l for p, l in block_quant}
    fused = fused_block(x, qv["params"], mask, heads, scale,
                        interpret=True, quant=flat_quant)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    # and it genuinely quantized: int8 kernels, error vs f32 small but nonzero
    assert qv["params"]["qkv_kernel"].dtype == jnp.int8
    f32 = block.apply(variables, x, train=False)
    err = np.abs(np.asarray(fused) - np.asarray(f32)).mean()
    assert 0 < err <= 0.1 * float(np.abs(np.asarray(f32)).mean())


@pytest.mark.parametrize("mixer,heads,hw", [("Global", 2, (4, 8)),
                                            ("Local", 4, (4, 8))])
def test_fused_block_int8_attention(rng, mixer, heads, hw):
    """attn_int8 mode: the fused kernel's int8 QK^T / PV match a plain-jnp
    reference of the same quantization math; output stays within combined
    quantization error of the f32 block."""
    from mrn_tpu.ops.int8 import quantize_variables
    import mrn_tpu.models.svtr as svtr

    n = hw[0] * hw[1]
    c = 32
    head_dim = c // heads
    block = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0)
    x = jnp.asarray(rng.normal(size=(2, n, c)).astype(np.float32))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    calib = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw, drop_path=0.0,
                  quant="calib")
    _, upd = calib.apply(variables, x, train=False, mutable=["quant"])
    qv = quantize_variables(dict(variables, quant=upd["quant"]))
    q = qv["quant"]

    mask_np = local_attention_mask(*hw) if mixer == "Local" else None
    mask = (jnp.zeros((n, n), jnp.float32) if mask_np is None
            else jnp.asarray(mask_np, jnp.float32))
    scale = head_dim ** -0.5

    svtr.set_attention_int8(True)
    try:
        fused = fused_block(x, qv["params"], mask_np, heads, scale,
                            interpret=True, quant=q)
    finally:
        svtr.set_attention_int8(False)

    # plain-jnp reference of the same w8a8 math (projections + attention)
    p = qv["params"]

    def ln(h, s, b):
        mean = h.mean(-1, keepdims=True)
        var = (h * h).mean(-1, keepdims=True) - mean * mean
        return (h - mean) * jax.lax.rsqrt(var + 1e-6) * s + b

    def quant8(h, amax):
        s = jnp.maximum(amax, 1e-12) / 127.0
        return jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8), s

    def proj8(h, kernel, w_scale, amax, bias):
        h8, s = quant8(h, amax)
        y = jax.lax.dot_general(h8, kernel, (((h8.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (s * w_scale) + bias

    def ref_block(xb):  # [N, C]
        h = ln(xb, p["norm1_scale"], p["norm1_bias"])
        qkv = proj8(h, p["qkv_kernel"], q["w_scale_qkv"],
                    q["act_amax_qkv"], p["qkv_bias"])
        outs = []
        for hd in range(heads):
            lo = hd * head_dim
            qh = qkv[:, lo:lo + head_dim] * scale
            kh = qkv[:, c + lo:c + lo + head_dim]
            vh = qkv[:, 2 * c + lo:2 * c + lo + head_dim]
            q8a, sq = quant8(qh, q["act_amax_q"])
            k8, sk = quant8(kh, q["act_amax_k"])
            s_ = jax.lax.dot_general(q8a, k8, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            s_ = s_.astype(jnp.float32) * (sq * sk) + mask
            pr = jax.nn.softmax(s_, axis=-1)
            p8 = jnp.round(pr * 127.0).astype(jnp.int8)
            v8, sv = quant8(vh, q["act_amax_v"])
            o = jax.lax.dot_general(p8, v8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            outs.append(o.astype(jnp.float32) * (sv / 127.0))
        attn = jnp.concatenate(outs, axis=-1)
        attn = proj8(attn, p["proj_kernel"], q["w_scale_proj"],
                     q["act_amax_proj"], p["proj_bias"])
        xb = xb + attn
        h = ln(xb, p["norm2_scale"], p["norm2_bias"])
        h = jax.nn.gelu(proj8(h, p["fc1_kernel"], q["w_scale_fc1"],
                              q["act_amax_fc1"], p["fc1_bias"]),
                        approximate=False)
        h = proj8(h, p["fc2_kernel"], q["w_scale_fc2"],
                  q["act_amax_fc2"], p["fc2_bias"])
        return xb + h

    ref = jax.vmap(ref_block)(x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # sanity: still close to the f32 block (quantization-level error only)
    f32 = block.apply(variables, x, train=False)
    err = np.abs(np.asarray(fused) - np.asarray(f32)).mean()
    assert err <= 0.15 * float(np.abs(np.asarray(f32)).mean())


def test_block_train_path_unchanged_by_param_restructure(rng):
    """The composed path still trains (grads flow through direct params)."""
    block = Block(dim=16, num_heads=2, mixer="Global", hw=(2, 4),
                  drop_path=0.1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(p):
        return block.apply({"params": p}, x, train=True,
                           rngs={"droppath": jax.random.PRNGKey(1)}).sum()

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(g["qkv_kernel"]).sum()) > 0
    assert float(jnp.abs(g["fc2_kernel"]).sum()) > 0


def test_erf_poly_accuracy_dense_grid():
    """Both transcendental-free minimax erf variants (shifted-monomial
    Horner, no exp/divide) hold their documented error bounds against the
    f64 oracle over a dense full-range f32 grid, including the |z| > 3.7
    saturation region and odd symmetry: degree 15 < 3e-7 (below bf16
    resolution), degree 9 (the fused-kernel default) < 1.5e-4 (below the
    bf16 cast noise of the MLP hidden it feeds)."""
    import math

    from mrn_tpu.ops.svtr_block import (_ERF9_COEFS, _ERF_COEFS, _erf_poly,
                                        _gelu_kernel)

    z = np.linspace(-30.0, 30.0, 400001).astype(np.float32)
    oracle = np.vectorize(math.erf)(z.astype(np.float64))
    for coefs, bound in ((_ERF_COEFS, 3e-7), (_ERF9_COEFS, 1.5e-4)):
        got = np.asarray(jax.jit(
            lambda v: _erf_poly(v, coefs))(jnp.asarray(z)))
        assert np.max(np.abs(got - oracle)) < bound
        # odd symmetry + exact saturation
        np.testing.assert_array_equal(
            np.asarray(jax.jit(
                lambda v: _erf_poly(v, coefs))(jnp.asarray(-z))), -got)
        assert got[0] == -1.0 and got[-1] == 1.0

    # end-to-end through the GELU used by the fused kernel (deg-9 default:
    # |gelu err| <= 0.5*|x|*erf_err inside the non-saturated band)
    x = np.linspace(-12.0, 12.0, 200001).astype(np.float32)
    gelu_oracle = 0.5 * x.astype(np.float64) * (
        1.0 + np.vectorize(math.erf)(x.astype(np.float64) / math.sqrt(2)))
    gelu_got = np.asarray(jax.jit(
        lambda v: _gelu_kernel(v, False))(jnp.asarray(x)))
    assert np.max(np.abs(gelu_got - gelu_oracle)) < 4e-4
