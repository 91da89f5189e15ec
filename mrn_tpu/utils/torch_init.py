"""PyTorch-compatible weight initializers for flax modules.

The reference initializes ALL parameters named "weight" with
``init.kaiming_normal_`` and "bias" with zeros, BatchNorm scales with 1, and
skips the TPS ``localization_fc2`` (reference: il_modules/base.py:52-65).
Modules (re)built mid-run (e.g. the Attn decoder at each task boundary,
reference: modules/model.py:176-189) keep PyTorch *default* inits.  Matching
these distributions matters for accuracy parity, so both families live here.

Shape conventions: flax Dense kernels are [in, out] (torch Linear weights are
[out, in]) and conv kernels are [kh, kw, in, out] (torch: [out, in, kh, kw]);
fan_in/fan_out below are computed for the flax layouts.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "kaiming_normal",
    "torch_linear_default",
    "torch_bias_default",
    "torch_lstm_default",
    "normal_init",
    "zeros_init",
    "ones_init",
]


def _fan_in_out(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:  # dense [in, out]
        return shape[0], shape[1]
    # conv [kh, kw, in, out]
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ defaults: fan_in, leaky_relu(a=0) ->
    std = sqrt(2 / fan_in)."""
    fan_in, _ = _fan_in_out(shape)
    std = math.sqrt(2.0 / max(1, fan_in))
    return std * jax.random.normal(key, shape, dtype)


def torch_linear_default(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)."""
    fan_in, _ = _fan_in_out(shape)
    bound = 1.0 / math.sqrt(max(1, fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_default(fan_in: int):
    """torch.nn.Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(max(1, fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_lstm_default(hidden_size: int):
    """torch.nn.LSTM/LSTMCell default: every weight & bias U(-k, k), k=1/sqrt(hidden)."""
    bound = 1.0 / math.sqrt(max(1, hidden_size))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_init(std=1.0):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
