"""Shared building blocks for the recognizer backbones.

Layout is TPU-native NHWC throughout; parameter initializers reproduce the
PyTorch defaults so that modules (re)built mid-run match the reference's
distributions (see mrn_tpu.utils.torch_init).  The reference's global task-0
init pass (kaiming weights / zero biases / unit BN scales, skipping the TPS
``localization_fc2``; il_modules/base.py:52-65) lives in
``mrn_tpu.models.surgery.apply_reference_init``.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrn_tpu.utils.torch_init import torch_bias_default, torch_linear_default

__all__ = ["TorchConv", "TorchDense", "batch_norm", "max_pool", "avg_pool",
           "global_avg_pool"]


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's variable layout (kernel HWIO,
    bias [out]) for TorchConv's int8 path."""

    features: int
    kernel_size: Tuple[int, int]
    in_per_group: int
    use_bias: bool
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_default,
                            (*self.kernel_size, self.in_per_group,
                             self.features))
        bias = (self.param("bias", torch_bias_default(self.fan_in),
                           (self.features,)) if self.use_bias else None)
        return kernel, bias


class TorchConv(nn.Module):
    """Conv2d with torch default init (kaiming_uniform(a=sqrt(5)) kernel,
    U(+-1/sqrt(fan_in)) bias). NHWC; kernel [kh, kw, in, out].

    ``quant`` enables the post-training w8a8 path (mrn_tpu.ops.int8):
    "calib" records the per-conv input absmax into the ``quant`` collection
    (apply with mutable=["quant"]) while computing the normal float conv;
    "int8" expects an int8 kernel in ``params`` plus act_amax/w_scale in
    ``quant`` (produced by ops.int8.quantize_variables) and runs the conv
    int8 x int8 -> int32 on the MXU, dequantizing into the float epilogue."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    feature_group_count: int = 1
    quant: str = "none"  # "none" | "calib" | "int8"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.feature_group_count) * self.kernel_size[0] * self.kernel_size[1]
        pad = [(self.padding[0], self.padding[0]),
               (self.padding[1], self.padding[1])]

        if self.quant == "int8":
            from mrn_tpu.ops.int8 import conv_int8, quantize_act
            # params live under the same "Conv_0" child scope the float
            # nn.Conv path uses, so quantized and float variables share one
            # checkpoint layout
            kernel, bias = _ConvParams(
                self.features, self.kernel_size,
                in_ch // self.feature_group_count, self.use_bias, fan_in,
                name="Conv_0")()
            amax = self.variable("quant", "act_amax",
                                 lambda: jnp.zeros((), jnp.float32)).value
            w_scale = self.variable(
                "quant", "w_scale",
                lambda: jnp.ones((self.features,), jnp.float32)).value
            x_q, a_scale = quantize_act(x, amax)
            y = conv_int8(x_q, kernel, self.strides, pad,
                          self.feature_group_count)
            y = y.astype(jnp.float32) * (a_scale * w_scale)
            if bias is not None:
                y = y + bias
            return y.astype(x.dtype)

        if self.quant == "calib":
            amax_var = self.variable("quant", "act_amax",
                                     lambda: jnp.zeros((), jnp.float32))
            amax_var.value = jnp.maximum(
                amax_var.value, jnp.max(jnp.abs(x)).astype(jnp.float32))

        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_linear_default,
            bias_init=torch_bias_default(fan_in),
        )(x)


class TorchDense(nn.Module):
    """Linear with torch default init.  Parameters are defined directly
    (kernel [in, out], bias [out]) so surgery paths stay flat (e.g.
    ('fc', 'kernel'))."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_default, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_bias_default(fan_in), (self.features,))
            y = y + bias
        return y


def batch_norm(x, train: bool, name: str = "bn"):
    """BatchNorm2d with torch semantics (momentum 0.1 -> flax 0.9, eps 1e-5)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )(x)


def max_pool(x, window, strides, padding=((0, 0), (0, 0))):
    """MaxPool2d; explicit padding pads with -inf like torch."""
    return nn.max_pool(x, window_shape=tuple(window), strides=tuple(strides),
                       padding=tuple(tuple(p) for p in padding))


def avg_pool(x, window, strides, padding=((0, 0), (0, 0))):
    """AvgPool2d with count_include_pad=True (torch default)."""
    ones = jnp.ones_like(x)
    summed = nn.pooling.pool(x, 0.0, jnp.add, tuple(window), tuple(strides),
                             tuple(tuple(p) for p in padding))
    denom = float(window[0] * window[1])
    return summed / denom


def global_avg_pool(x):
    """AdaptiveAvgPool2d(1) -> [B, C]."""
    return x.mean(axis=(1, 2))
