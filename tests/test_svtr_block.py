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
def test_fused_block_matches_composed(rng, mixer, heads, hw):
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
