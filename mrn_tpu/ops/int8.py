"""Post-training w8a8 quantization for the conv feature extractors.

The TRBA pipeline is compute-bound in its FAN ResNet (21.5 GFLOP/image,
~74% MXU utilization in bf16 — see README perf table), so int8 is the
remaining ~2x lever: the v5e MXU delivers twice the int8 OPS of bf16.
The reference has no quantized path (pure fp32 torch, modules/
feature_extraction.py:100-352); this is a TPU-native addition.

Scheme (standard w8a8 PTQ):
- conv kernels: symmetric per-output-channel int8, scale = amax/127 over
  (kh, kw, cin);
- activations: symmetric per-tensor int8 with calibrated absmax (post-ReLU
  inputs are non-negative, so the effective precision is 7 bits — the usual
  trade for symmetric quant);
- conv runs int8 x int8 -> int32 on the MXU (lax.conv_general_dilated with
  preferred_element_type=int32), dequantized by (act_scale * w_scale[c])
  into the float epilogue (bias/BN/ReLU), which XLA fuses.

Wiring: ``TorchConv(quant="calib")`` records per-conv input absmax into the
``quant`` variable collection (run a few batches with mutable=["quant"]);
``quantize_variables`` then rewrites the calibrated convs' kernels to int8
and stores their scales alongside; ``TorchConv(quant="int8")`` consumes
both.  Only convs that saw calibration are quantized — modules outside the
quantized subtree (TPS localization, BiLSTM, heads) keep their float path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_kernel", "quantize_act", "conv_int8",
           "quantize_variables"]


def quantize_kernel(w: jnp.ndarray):
    """Per-output-channel symmetric int8 for an HWIO conv kernel.
    Returns (int8 kernel, float32 scale[cout])."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_act(x: jnp.ndarray, amax: jnp.ndarray):
    """Per-tensor symmetric int8.  Returns (int8 x, float32 scale)."""
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def conv_int8(x_q: jnp.ndarray, w_q: jnp.ndarray, strides, padding,
              feature_group_count: int = 1) -> jnp.ndarray:
    """int8 x int8 -> int32 NHWC conv (MXU-native on TPU)."""
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=tuple(strides), padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)


def _walk(params, quant, out_params, out_quant):
    """Recursively rewrite calibrated conv kernels to int8 + scales.
    A calibrated TorchConv scope looks like params {'Conv_0': {'kernel':
    [kh,kw,in,out], ...}} next to quant {'act_amax': scalar}."""
    for k, v in params.items():
        q = quant.get(k) if isinstance(quant, dict) else None
        inner = v.get("Conv_0") if isinstance(v, dict) else None
        if (isinstance(q, dict) and "act_amax" in q
                and isinstance(inner, dict)
                and getattr(inner.get("kernel"), "ndim", 0) == 4):
            kq, scale = quantize_kernel(inner["kernel"])
            out_params[k] = dict(v, Conv_0=dict(inner, kernel=kq))
            out_quant[k] = dict(q, w_scale=scale)
        elif isinstance(v, dict):
            out_params[k] = {}
            out_quant[k] = dict(q) if isinstance(q, dict) else {}
            _walk(v, q if isinstance(q, dict) else {},
                  out_params[k], out_quant[k])
        else:
            out_params[k] = v


def quantize_variables(variables: dict) -> dict:
    """Rewrite every calibrated conv (has quant/act_amax) in ``variables``:
    kernel -> int8, scale -> quant collection.  Returns new variables with
    the updated ``params`` and ``quant`` collections; everything else is
    passed through untouched."""
    params = variables["params"]
    quant = variables.get("quant", {})
    new_params: dict = {}
    new_quant: dict = {}
    _walk(params, quant, new_params, new_quant)
    out = dict(variables)
    out["params"] = new_params
    out["quant"] = new_quant
    return out
