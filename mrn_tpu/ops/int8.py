"""Post-training w8a8 quantization for the conv feature extractors and the
SVTR transformer-block projections.

The TRBA pipeline is compute-bound in its FAN ResNet (21.5 GFLOP/image,
~74% MXU utilization in bf16 — see README perf table), so int8 is the
remaining ~2x lever: the v5e MXU delivers twice the int8 OPS of bf16.
SVTR's block projections (qkv / proj / fc1 / fc2) carry ~79% of its FLOPs,
so the same scheme applies there (the attention matmuls stay bf16 —
head_dim 32 keeps them contraction-pad-bound either way).  The reference
has no quantized path (pure fp32 torch, modules/feature_extraction.py:
100-352, modules/svtr.py:315-532); this is a TPU-native addition.

Scheme (standard w8a8 PTQ):
- kernels: symmetric per-output-channel int8, scale = amax/127 over the
  input axes ((kh, kw, cin) for convs, cin for dense);
- activations: symmetric per-tensor int8 with calibrated absmax (post-ReLU
  inputs are non-negative, so the effective precision is 7 bits — the usual
  trade for symmetric quant);
- the matmul runs int8 x int8 -> int32 on the MXU (preferred_element_type=
  int32), dequantized by (act_scale * w_scale[c]) into the float epilogue
  (bias/BN/ReLU), which XLA fuses.

Wiring: ``TorchConv(quant="calib")`` / ``svtr.Block(quant="calib")`` record
per-matmul input absmax into the ``quant`` variable collection (run a few
batches with mutable=["quant"]); ``quantize_variables`` then rewrites the
calibrated kernels to int8 and stores their scales alongside; the same
modules with ``quant="int8"`` consume both.  Only scopes that saw
calibration are quantized — modules outside the quantized subtree (TPS
localization, BiLSTM, heads) keep their float path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_kernel", "quantize_act", "conv_int8", "dense_int8",
           "quantize_variables"]

# SVTR Block projections (models/svtr.py): params key -> quant scale key.
SVTR_PROJ_KERNELS = (("qkv_kernel", "qkv"), ("proj_kernel", "proj"),
                     ("fc1_kernel", "fc1"), ("fc2_kernel", "fc2"))


def quantize_kernel(w: jnp.ndarray):
    """Per-output-channel symmetric int8 for an HWIO conv kernel or an
    [in, out] dense kernel.  Returns (int8 kernel, float32 scale[out])."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
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


def dense_int8(x_q: jnp.ndarray, w_q: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., in] x int8 [in, out] -> int32 (MXU-native on TPU)."""
    return jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def dense_w8a8(x, kernel_q, w_scale, amax, bias=None):
    """Full w8a8 dense: per-tensor act quant (calibrated ``amax``), int8
    matmul, float epilogue.  Returns x.dtype."""
    x_q, a_scale = quantize_act(x, amax)
    y = dense_int8(x_q, kernel_q).astype(jnp.float32)
    y = y * (a_scale * w_scale.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _quantize_block(params: dict, quant: dict):
    """Rewrite a calibrated SVTR Block scope: the four projection kernels
    go int8, per-projection w_scale_<name> lands next to act_amax_<name>."""
    new_p = dict(params)
    new_q = dict(quant)
    for pkey, qname in SVTR_PROJ_KERNELS:
        kq, scale = quantize_kernel(params[pkey])
        new_p[pkey] = kq
        new_q[f"w_scale_{qname}"] = scale
    return new_p, new_q


def _walk(params, quant, out_params, out_quant):
    """Recursively rewrite calibrated conv kernels to int8 + scales.
    A calibrated TorchConv scope looks like params {'Conv_0': {'kernel':
    [kh,kw,in,out], ...}} next to quant {'act_amax': scalar}; a calibrated
    SVTR Block scope has the projection kernels directly in ``params`` next
    to quant {'act_amax_qkv': ...} (models/svtr.py Block)."""
    for k, v in params.items():
        q = quant.get(k) if isinstance(quant, dict) else None
        inner = v.get("Conv_0") if isinstance(v, dict) else None
        if (isinstance(q, dict) and "act_amax" in q
                and isinstance(inner, dict)
                and getattr(inner.get("kernel"), "ndim", 0) == 4):
            kq, scale = quantize_kernel(inner["kernel"])
            out_params[k] = dict(v, Conv_0=dict(inner, kernel=kq))
            out_quant[k] = dict(q, w_scale=scale)
        elif (isinstance(q, dict) and "act_amax_qkv" in q
                and isinstance(v, dict) and "qkv_kernel" in v):
            out_params[k], out_quant[k] = _quantize_block(v, q)
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
    quant = variables.get("quant") or {}  # tolerate None (empty calibration)
    if "act_amax_qkv" in quant and "qkv_kernel" in params:
        # a bare SVTR Block as the root module (tests / kernel tools)
        new_params, new_quant = _quantize_block(params, quant)
    else:
        new_params, new_quant = {}, {}
        _walk(params, quant, new_params, new_quant)
    out = dict(variables)
    out["params"] = new_params
    out["quant"] = new_quant
    return out
