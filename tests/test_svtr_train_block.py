"""Fused training-mode SVTR block (ops/svtr_train_block): forward and
GRADIENT parity vs the composed path's autodiff — the oracle chain for the
round-5 train-step optimization (VERDICT r4 #2).

All runs are f32 on the CPU interpreter, where the composed path's
`_manual_layer_norm` / poly-GELU math is bit-comparable, so tolerances are
f32 noise, not bf16 noise.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mrn_tpu.models.svtr as svtr_mod
from mrn_tpu.models.svtr import Block
from mrn_tpu.ops.svtr_block import _ERF_COEFS, _band_spec, _erf_poly
from mrn_tpu.ops.svtr_train_block import (_gelu15, _gelu15_grad,
                                          fused_block_train)

# Local (4, 64) is the SVTR stage-2 geometry: band plan qb=64 width=128.
# Global uses mask-free full attention (stage-3 shape, shrunk).
GEOMS = [
    pytest.param("Global", 2, (4, 16), False, id="global"),
    pytest.param("Local", 2, (4, 64), True, id="local_banded"),
]


@pytest.fixture(autouse=True)
def xla_impl():
    svtr_mod.set_attention_impl("xla")
    svtr_mod.set_train_gelu("poly")  # match the kernel's degree-15 GELU
    yield
    svtr_mod.set_attention_impl("auto")
    svtr_mod.set_train_gelu("auto")


def _build(mixer, heads, hw, col_major, rng, batch=3, c=32):
    n = hw[0] * hw[1]
    block = Block(dim=c, num_heads=heads, mixer=mixer, hw=hw,
                  drop_path=0.0, col_major=col_major)
    x = jnp.asarray(rng.normal(size=(batch, n, c)).astype(np.float32))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    band = ((hw[0], hw[1], 7, 11)
            if (mixer == "Local" and col_major) else None)
    return block, variables, x, band


def _fused(params, x, heads, c, band, dm=None):
    scale = (c // heads) ** -0.5
    ones = jnp.ones((x.shape[0], 1), jnp.float32)
    dm_a, dm_b = (dm if dm is not None else (ones, ones))
    return fused_block_train(x, params, dm_a, dm_b, num_heads=heads,
                             scale=scale, band=band, interpret=True)


@pytest.mark.parametrize("mixer,heads,hw,col_major", GEOMS)
def test_forward_matches_composed(rng, mixer, heads, hw, col_major):
    block, variables, x, band = _build(mixer, heads, hw, col_major, rng)
    ref = block.apply(variables, x, train=True)
    out = _fused(variables["params"], x, heads, x.shape[-1], band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
@pytest.mark.parametrize("mixer,heads,hw,col_major", GEOMS)
def test_gradients_match_composed_autodiff(rng, mixer, heads, hw, col_major,
                                           bwd_impl, monkeypatch):
    """Grads wrt x AND every one of the 12 block params match reverse-mode
    autodiff of the composed XLA path under a random cotangent — for BOTH
    custom-VJP backends (the whole-block Pallas backward kernel and the
    hand-written XLA einsum backward)."""
    monkeypatch.setenv("MRN_FUSED_BWD", bwd_impl)
    block, variables, x, band = _build(mixer, heads, hw, col_major, rng,
                                       batch=2)
    c = x.shape[-1]
    w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def loss_ref(params, x_):
        return jnp.sum(block.apply({"params": params}, x_, train=True) * w)

    def loss_fused(params, x_):
        return jnp.sum(_fused(params, x_, heads, c, band) * w)

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(
        variables["params"], x)
    (gp_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(
        variables["params"], x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               atol=3e-4, rtol=3e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_f))
    assert len(flat_ref) == 12
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf),
            atol=3e-4, rtol=3e-4,
            err_msg=f"param grad mismatch at {path}")


def test_droppath_masks_scale_gradients(rng, monkeypatch):
    """Non-trivial per-image droppath masks: the Pallas backward must see the
    same per-branch row scaling the forward applied (compare against the XLA
    backward, which the composed-autodiff test above already anchors)."""
    block, variables, x, band = _build("Global", 2, (4, 16), False, rng,
                                       batch=4)
    c = x.shape[-1]
    w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    dm_a = jnp.asarray([[1.25], [0.0], [1.25], [1.25]], jnp.float32)
    dm_b = jnp.asarray([[0.0], [1.25], [1.25], [0.0]], jnp.float32)

    def loss(params, x_):
        return jnp.sum(_fused(params, x_, 2, c, band, dm=(dm_a, dm_b)) * w)

    grads = {}
    for impl in ("pallas", "xla"):
        monkeypatch.setenv("MRN_FUSED_BWD", impl)
        grads[impl] = jax.grad(loss, argnums=(0, 1))(variables["params"], x)
    for ref_leaf, pl_leaf in zip(jax.tree_util.tree_leaves(grads["xla"]),
                                 jax.tree_util.tree_leaves(grads["pallas"])):
        np.testing.assert_allclose(np.asarray(pl_leaf), np.asarray(ref_leaf),
                                   atol=1e-5, rtol=1e-5)


def test_droppath_zero_mask_is_identity(rng):
    """Both branch masks zero -> the block is the identity, and the input
    cotangent passes through unchanged (droppath semantics through the
    custom VJP)."""
    block, variables, x, band = _build("Global", 2, (4, 16), False, rng,
                                       batch=2)
    zeros = jnp.zeros((x.shape[0], 1), jnp.float32)
    out = _fused(variables["params"], x, 2, x.shape[-1], band,
                 dm=(zeros, zeros))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    g = jax.grad(lambda x_: jnp.sum(
        _fused(variables["params"], x_, 2, x.shape[-1], band,
               dm=(zeros, zeros)) * x_))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=1e-5,
                               rtol=1e-5)


def test_gelu15_grad_matches_autodiff():
    x = jnp.linspace(-8.0, 8.0, 4097, dtype=jnp.float32)
    auto = jax.vmap(jax.grad(_gelu15))(x)
    manual = _gelu15_grad(x)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(auto),
                               atol=1e-6, rtol=1e-6)


def test_unbanded_local_mask_rejected(rng):
    """A Local geometry without a banded plan must raise, not silently run
    mask-free Global attention."""
    heads, hw = 2, (4, 8)  # N=32: no banded plan exists
    assert _band_spec(hw[0], hw[1], 7, 11) is None
    block, variables, x, _ = _build("Local", heads, hw, True, rng)
    with pytest.raises(ValueError):
        _fused(variables["params"], x, heads, x.shape[-1],
               (hw[0], hw[1], 7, 11))
