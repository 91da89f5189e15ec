import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrn_tpu.models.svtr import local_attention_mask
from mrn_tpu.ops.svtr_attention import mha_small_n, xla_attention


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
