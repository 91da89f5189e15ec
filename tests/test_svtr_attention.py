import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrn_tpu.models.svtr import (local_attention_mask,
                                 local_attention_mask_col_major)
from mrn_tpu.ops.svtr_attention import (banded_attention_xla, mha_small_n,
                                        xla_attention)


def _rand_qkv(rng, b=2, h=2, n=32, d=16):
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_pallas_attention_matches_xla_unmasked(rng):
    q, k, v = _rand_qkv(rng)
    ours = mha_small_n(q, k, v, None, interpret=True)
    ref = xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_attention_matches_xla_masked(rng):
    h, w = 4, 8
    mask = local_attention_mask(h, w, 3, 5)
    q, k, v = _rand_qkv(rng, n=h * w)
    ours = mha_small_n(q, k, v, mask, interpret=True)
    ref = xla_attention(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_attention_grad_matches_xla(rng):
    q, k, v = _rand_qkv(rng, n=16, d=8)

    def loss_pallas(q, k, v):
        return mha_small_n(q, k, v, None, interpret=True).sum()

    def loss_xla(q, k, v):
        return xla_attention(q, k, v, None).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_local_mask_blocks_out_of_window(rng):
    mask = local_attention_mask(2, 4, 3, 3)
    assert mask.shape == (8, 8)
    assert mask[0, 0] == 0.0
    # position (0,0) cannot attend to (1,3) (outside the 3x3 window)
    assert mask[0, 7] == -np.inf


# Both SVTR training geometries that trigger banding: stage 1 (8, 64) ->
# qb 128 / width 256, stage 2 (4, 64) -> qb 64 / width 128.
BAND_GEOMS = [(8, 64, 7, 11), (4, 64, 7, 11)]


@pytest.mark.parametrize("band", BAND_GEOMS)
def test_banded_xla_matches_full_masked(rng, band):
    from mrn_tpu.ops.svtr_block import _band_spec

    assert _band_spec(*band) is not None  # geometry must actually band
    h, w = band[0], band[1]
    mask = local_attention_mask_col_major(*band)
    q, k, v = _rand_qkv(rng, b=1, h=2, n=h * w, d=8)
    ours = banded_attention_xla(q, k, v, band)
    ref = xla_attention(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_banded_xla_grad_matches_full(rng):
    band = (4, 64, 7, 11)
    mask = jnp.asarray(local_attention_mask_col_major(*band))
    q, k, v = _rand_qkv(rng, b=1, h=2, n=256, d=8)
    gout = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_banded(q, k, v):
        return (banded_attention_xla(q, k, v, band) * gout).sum()

    def loss_full(q, k, v):
        return (xla_attention(q, k, v, mask) * gout).sum()

    g1 = jax.grad(loss_banded, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_banded_pallas_fwd_and_grad(rng):
    """mha_small_n(band=...): banded Pallas forward == full masked XLA, and
    the banded-XLA custom-VJP backward == full-path gradients."""
    band = (4, 64, 7, 11)
    mask = jnp.asarray(local_attention_mask_col_major(*band))
    q, k, v = _rand_qkv(rng, b=1, h=2, n=256, d=8)
    ours = mha_small_n(q, k, v, band=band, interpret=True)
    ref = xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    gout = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    g1 = jax.grad(lambda q, k, v: (mha_small_n(
        q, k, v, band=band, interpret=True) * gout).sum(),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (xla_attention(q, k, v, mask) * gout).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_band_spec_none_falls_back(rng):
    """A geometry whose window covers all keys must not band — and
    mha_small_n/banded_attention_xla must still be correct through the
    fallback."""
    from mrn_tpu.ops.svtr_block import _band_spec

    band = (8, 8, 7, 11)  # 64 tokens, window spans everything
    assert _band_spec(*band) is None
    mask = jnp.asarray(local_attention_mask_col_major(*band))
    q, k, v = _rand_qkv(rng, b=1, h=2, n=64, d=8)
    np.testing.assert_allclose(
        np.asarray(banded_attention_xla(q, k, v, band)),
        np.asarray(xla_attention(q, k, v, mask)), atol=1e-5)


def test_train_gelu_poly_value_and_grad(rng):
    """Degree-15 erf-poly GELU (training path): value AND gradient both far
    below bf16 resolution (the gradient bound is why training uses degree 15
    while the inference kernel keeps degree 9 — the deg-9 fit's derivative
    deviates up to 2.4e-2)."""
    from mrn_tpu.models import svtr as svtr_mod

    x = jnp.asarray(np.linspace(-8, 8, 8001, dtype=np.float32))
    svtr_mod.set_train_gelu("poly")
    try:
        y_poly = svtr_mod._gelu(x)
        g_poly = jax.vmap(jax.grad(lambda t: svtr_mod._gelu(t)))(x)
    finally:
        svtr_mod.set_train_gelu("auto")
    y_ref = jax.nn.gelu(x, approximate=False)
    g_ref = jax.vmap(jax.grad(
        lambda t: jax.nn.gelu(t, approximate=False)))(x)
    assert float(jnp.max(jnp.abs(y_poly - y_ref))) < 2e-6
    assert float(jnp.max(jnp.abs(g_poly - g_ref))) < 5e-5
