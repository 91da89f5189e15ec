"""SVTR single-visual-model backbone (reference: modules/svtr.py:315-532 with
the configuration actually used by the configs: embed (64,128,256), depth
(3,6,3), heads (2,4,8), mixers Local x6 then Global x6, Conv patch merging,
out_channels = output_channel).

TPU notes: every attention here is a tiny fixed-length (<=512 tokens)
full-batch attention — it compiles to plain MXU matmuls, no KV caching or
masked-gather machinery needed.  The local-window additive mask is a static
numpy constant baked into the jaxpr.  Drop-path (stochastic depth, rate
linspace(0, 0.1, 12)) uses the 'droppath' RNG stream when training.

Init parity: the reference's SVTR applies its own init at construction
(Linear trunc_normal(.02)/bias 0, Conv kaiming_normal fan_in, LayerNorm bias
set to 1.0 — a reference quirk, svtr.py:489-498) which matters for experts
created at task > 0; the global task-0 pass overrides it anyway.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.models.common import batch_norm
from mrn_tpu.utils.torch_init import zeros_init

__all__ = ["SVTRExtractor"]

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

# Kernel implementation switch: "xla" (composed einsums) or "pallas"
# (VMEM-resident kernels, mrn_tpu.ops.svtr_attention / svtr_block — the
# attention matrices and block activations never touch HBM).  "auto" picks
# pallas on TPU backends.  The fused whole-block kernel is inference-only;
# training uses the composed path with the pallas attention core.
_ATTENTION_IMPL = "auto"

# Serving-mode switch: tanh-approximate GELU instead of torch's exact erf.
# Exact erf costs ~20% of SVTR inference time on v5e (VPU transcendental);
# the approximation changes logits by <1e-3.  Default False for parity.
_GELU_APPROX = False


def set_attention_impl(impl: str):
    global _ATTENTION_IMPL
    assert impl in ("auto", "xla", "pallas")
    _ATTENTION_IMPL = impl


def set_gelu_approximate(flag: bool):
    global _GELU_APPROX
    _GELU_APPROX = bool(flag)


def gelu_approximate() -> bool:
    return _GELU_APPROX


# Training-path GELU implementation (round-5, VERDICT r4 #2): "poly" swaps
# the exact erf (exp-based VPU transcendental, and another exp for erf' in
# the backward) for the DEGREE-15 minimax erf polynomial (ops/svtr_block.
# _ERF_COEFS): |erf err| < 1.9e-7 and, because autodiff runs through the FMA
# chain, the gradient is polynomial too — measured |gelu' err| < 1.6e-5
# (dense grid, tests/test_svtr_attention.py), two orders below bf16
# resolution.  (The inference kernel's degree-9 fit is value-accurate but
# its DERIVATIVE deviates up to 2.4e-2 — fine for serving, not for
# gradients, so training gets the longer chain: 15 FMAs vs exp is still a
# large VPU win in both directions.)  "auto" = poly on TPU, exact erf
# elsewhere (keeps CPU torch-parity tests bit-faithful).
_TRAIN_GELU = "auto"


def set_train_gelu(mode: str):
    global _TRAIN_GELU
    assert mode in ("auto", "erf", "poly")
    _TRAIN_GELU = mode


def _gelu(x, allow_approx: bool = True):
    """GELU for the composed (training) path — honors the serving-mode
    tanh approximation first (Block MLP only, matching the fused kernel's
    scope), then the _TRAIN_GELU erf implementation."""
    if _GELU_APPROX and allow_approx:
        return nn.gelu(x, approximate=True)
    mode = _TRAIN_GELU
    if mode == "auto":
        import os as _os

        mode = _os.environ.get("MRN_TRAIN_GELU")  # A/B knob, trace-time
        if mode not in ("erf", "poly"):
            mode = "poly" if jax.default_backend() == "tpu" else "erf"
    if mode == "poly":
        from mrn_tpu.ops.svtr_block import _ERF_COEFS, _erf_poly

        return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5), _ERF_COEFS))
    return nn.gelu(x, approximate=False)


# Serving-mode switch: also run the attention matmuls (QK^T / PV) int8 in
# the fused w8a8 block kernel.  head_dim 32 pads the MXU contraction 4x, so
# these matmuls carry ~45% of SVTR's MXU ticks despite ~17% of its FLOPs;
# int8 halves the tick cost.  q/k/v use calibrated per-tensor scales
# (recorded by quant="calib"), P uses the static [0,1] -> /127 scale.
# Default False: quantization noise inside softmax is a second accuracy
# trade on top of the projection PTQ — enable after measuring both.
_ATTENTION_INT8 = False


def set_attention_int8(flag: bool):
    """Only affects the FUSED int8 kernel (TPU, quant="int8", no mesh): the
    composed path's attention always stays float, and the flag is read at
    TRACE time — set it before building/jitting the inference fn; an
    already-compiled function keeps whichever mode it traced with."""
    global _ATTENTION_INT8
    _ATTENTION_INT8 = bool(flag)


def attention_int8() -> bool:
    return _ATTENTION_INT8


def _impl_resolved() -> str:
    impl = _ATTENTION_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        # pallas_call has no SPMD partitioning rule: under a device mesh the
        # composed XLA path partitions cleanly, the kernel would force
        # replication (same gate as ops/grid_sample.py's dispatch).
        from mrn_tpu.parallel.mesh import get_mesh
        if get_mesh() is not None:
            impl = "xla"
    return impl


def _attention_core(q, k, v, mask, band=None):
    """``band`` = (h, w, hk, wk) when ``mask`` is a column-major Local
    window: scores/softmax/PV (and their backward) then run against a
    width-key window per query block instead of all N keys — identical math
    (out-of-window keys are -inf in ``mask``), ~2x less score/PV work on
    SVTR's stage-1/2 geometries.  Works on both impls: banded Pallas forward
    + banded XLA backward, or pure banded XLA (shardable under a mesh)."""
    import os as _os

    from mrn_tpu.ops.svtr_attention import (banded_attention_xla, mha_small_n,
                                            xla_attention)

    if band is not None and _os.environ.get("SVTR_BAND", "1") == "0":
        band = None  # A/B switch, same knob as the fused inference kernel
    if _impl_resolved() == "pallas":
        return mha_small_n(q, k, v, mask, band=band)
    if band is not None:
        from mrn_tpu.ops.svtr_block import _band_spec

        if _band_spec(*band) is not None:
            return banded_attention_xla(q, k, v, band)
    if mask is not None:
        mask = jnp.asarray(mask)
    return xla_attention(q, k, v, mask)


def score_envelope(module, variables, *args, **kwargs):
    """Max |attention score| over a sample batch, measured on the composed
    path (the fused kernel is bypassed while 'intermediates' is mutable).

    One-time per-checkpoint calibration for the fused kernel's
    reduction-free softmax (ops/svtr_block.SCORE_CLAMP): call on one
    validation batch after loading a checkpoint; a return value at/above the
    clamp means the fused kernel would silently flatten attention for that
    checkpoint (ADVICE r4).  Returns the scalar max; emits a loud stderr
    warning when out of envelope."""
    import sys as _sys

    from mrn_tpu.ops.svtr_block import SCORE_CLAMP

    _, inter = module.apply(variables, *args,
                            mutable=["intermediates"], **kwargs)
    leaves = jax.tree_util.tree_leaves(inter.get("intermediates", inter))
    if not leaves:
        return 0.0
    mx = float(max(float(jnp.max(l)) for l in leaves))
    if mx >= SCORE_CLAMP:
        print(f"*** SVTR score envelope VIOLATED: max |attention score| "
              f"{mx:.1f} >= clamp {SCORE_CLAMP} — the fused inference kernel "
              "would silently flatten attention for this checkpoint; use "
              "SVTR_IMPL=xla or retrain ***", file=_sys.stderr, flush=True)
    return mx


def _kaiming_fan_in(key, shape, dtype=jnp.float32):
    # torch kaiming_normal_(mode='fan_in') on conv kernels.
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    std = float(np.sqrt(2.0 / max(1, fan_in)))
    return std * jax.random.normal(key, shape, dtype)


def _svtr_dense(features, use_bias=True, name=None):
    return nn.Dense(features, use_bias=use_bias, kernel_init=_trunc02,
                    bias_init=zeros_init, name=name)


def _svtr_conv(features, kernel, strides=(1, 1), padding=(0, 0), name=None):
    return nn.Conv(features, kernel, strides=strides,
                   padding=[(padding[0], padding[0]), (padding[1], padding[1])],
                   kernel_init=_kaiming_fan_in, bias_init=zeros_init, name=name)


def _layer_norm(name=None):
    # Reference quirk: LayerNorm bias initialized to 1.0 (svtr.py:494-496).
    return nn.LayerNorm(epsilon=1e-6, bias_init=nn.initializers.ones, name=name)


def local_attention_mask(h: int, w: int, hk: int = 7, wk: int = 11) -> np.ndarray:
    """Static additive mask [HW, HW]: 0 within the hk x wk window around each
    query position, -inf outside (reference: modules/svtr.py:116-128)."""
    hw = h * w
    mask = np.ones((hw, h + hk - 1, w + wk - 1), dtype=np.float32)
    for i in range(h):
        for j in range(w):
            mask[i * w + j, i:i + hk, j:j + wk] = 0.0
    cropped = mask[:, hk // 2:h + hk // 2, wk // 2:w + wk // 2].reshape(hw, hw)
    return np.where(cropped < 1.0, 0.0, -np.inf).astype(np.float32)


def local_attention_mask_col_major(h: int, w: int, hk: int = 7,
                                   wk: int = 11) -> np.ndarray:
    """`local_attention_mask` with tokens in COLUMN-major order
    (token = col*h + row).  On the text-shaped (short-h, long-w) SVTR grids
    this turns the hk x wk window into a +/-((wk//2)*h + hk//2) band around
    the diagonal — the fused inference kernel exploits it by computing only
    a 128-lane-aligned key window per query block instead of all N keys
    (mrn_tpu.ops.svtr_block banded path).  Pure reindexing of the row-major
    mask: semantics are identical up to the token permutation the extractor
    applies around stages 1-2."""
    m = local_attention_mask(h, w, hk, wk)
    perm = np.arange(h * w).reshape(h, w).T.reshape(-1)
    return np.ascontiguousarray(m[np.ix_(perm, perm)])


def _to_col_major(x, h: int, w: int):
    """[B, h*w, C] row-major tokens -> column-major (token = col*h + row)."""
    b, n, c = x.shape
    return x.reshape(b, h, w, c).transpose(0, 2, 1, 3).reshape(b, n, c)


def _to_row_major(x, h: int, w: int):
    """Inverse of `_to_col_major` for an (h, w) grid."""
    b, n, c = x.shape
    return x.reshape(b, w, h, c).transpose(0, 2, 1, 3).reshape(b, n, c)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("droppath"), keep, shape)
        return x * mask.astype(x.dtype) / keep


def _manual_layer_norm(x, scale, bias, eps=1e-6):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = (xf * xf).mean(axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


class Block(nn.Module):
    """Transformer mixing block (LN -> multi-head [masked] attention -> LN ->
    MLP, pre-norm residuals).  Parameters are owned directly so the fused
    whole-block Pallas kernel (mrn_tpu.ops.svtr_block) and the composed XLA
    path share one tree.  Init: trunc_normal(.02) kernels, zero biases,
    LN bias 1.0 (the reference SVTR construction quirk)."""

    dim: int
    num_heads: int
    mixer: str
    hw: Tuple[int, int]
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    local_k: Tuple[int, int] = (7, 11)
    quant: str = "none"  # w8a8 PTQ of the 4 projections (mrn_tpu.ops.int8)
    # Tokens arrive column-major (the extractor permutes around stages 1-2):
    # Local masks become diagonal bands, letting the fused kernel skip the
    # masked-out key majority.  Global blocks are permutation-equivariant,
    # so the flag only selects which (equivalent) mask ordering Local uses.
    col_major: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.dim
        hidden = int(c * self.mlp_ratio)
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros

        params = dict(
            norm1_scale=self.param("norm1_scale", ones, (c,)),
            norm1_bias=self.param("norm1_bias", ones, (c,)),  # quirk
            qkv_kernel=self.param("qkv_kernel", _trunc02, (c, 3 * c)),
            qkv_bias=self.param("qkv_bias", zeros, (3 * c,)),
            proj_kernel=self.param("proj_kernel", _trunc02, (c, c)),
            proj_bias=self.param("proj_bias", zeros, (c,)),
            norm2_scale=self.param("norm2_scale", ones, (c,)),
            norm2_bias=self.param("norm2_bias", ones, (c,)),  # quirk
            fc1_kernel=self.param("fc1_kernel", _trunc02, (c, hidden)),
            fc1_bias=self.param("fc1_bias", zeros, (hidden,)),
            fc2_kernel=self.param("fc2_kernel", _trunc02, (hidden, c)),
            fc2_bias=self.param("fc2_bias", zeros, (c,)),
        )
        mask = None
        if self.mixer == "Local":
            build = (local_attention_mask_col_major if self.col_major
                     else local_attention_mask)
            mask = build(self.hw[0], self.hw[1], *self.local_k)

        # ---- w8a8 PTQ plumbing (mrn_tpu.ops.int8): "calib" records the
        # per-projection input absmax; "int8" consumes int8 kernels + scales.
        qv = None
        if self.quant == "int8":
            qv = {}
            for qname, out_dim in (("qkv", 3 * c), ("proj", c),
                                   ("fc1", hidden), ("fc2", c)):
                qv[f"act_amax_{qname}"] = self.variable(
                    "quant", f"act_amax_{qname}",
                    lambda: jnp.zeros((), jnp.float32)).value
                qv[f"w_scale_{qname}"] = self.variable(
                    "quant", f"w_scale_{qname}",
                    lambda d=out_dim: jnp.ones((d,), jnp.float32)).value
            for qname in ("q", "k", "v"):  # int8-attention scales
                qv[f"act_amax_{qname}"] = self.variable(
                    "quant", f"act_amax_{qname}",
                    lambda: jnp.zeros((), jnp.float32)).value

        def record_amax(qname, h):
            var = self.variable("quant", f"act_amax_{qname}",
                                lambda: jnp.zeros((), jnp.float32))
            var.value = jnp.maximum(
                var.value, jnp.max(jnp.abs(h)).astype(jnp.float32))

        def project(qname, h, kernel, bias):
            if self.quant == "calib":
                record_amax(qname, h)
            if qv is not None:
                from mrn_tpu.ops.int8 import dense_w8a8
                return dense_w8a8(h, kernel, qv[f"w_scale_{qname}"],
                                  qv[f"act_amax_{qname}"], bias)
            return h @ kernel + bias

        use_fused = ((not train) and _impl_resolved() == "pallas"
                     and self.quant != "calib"
                     and not self.is_mutable_collection("intermediates"))
        if use_fused:
            from mrn_tpu.ops.svtr_block import fused_block
            band = ((self.hw[0], self.hw[1], self.local_k[0],
                     self.local_k[1])
                    if (mask is not None and self.col_major) else None)
            return fused_block(x, params, mask, self.num_heads, scale,
                               quant=qv, band=band)

        # ---- fused TRAINING path (round-5, VERDICT r4 #2): whole block in
        # one Pallas kernel + residual-saving custom VJP (ops/svtr_train_
        # block).  Local blocks need the col-major banded plan (band=None
        # means Global there); droppath becomes pre-divided per-image keep
        # masks so fwd/bwd see identical masks through the VJP residuals.
        # Opt-in via MRN_FUSED_TRAIN=1 so long multi-stage campaigns cannot
        # change code paths at a process-recycle boundary mid-run; bench.py
        # and the campaign launcher enable it explicitly.
        import os as _os
        use_fused_train = (train and _impl_resolved() == "pallas"
                           and self.quant == "none"
                           and not self.is_mutable_collection("intermediates")
                           and _os.environ.get("MRN_FUSED_TRAIN", "0") == "1")
        if use_fused_train:
            from mrn_tpu.ops.svtr_block import _band_spec
            from mrn_tpu.ops.svtr_train_block import fused_block_train
            n_tok = x.shape[1]
            band = ((self.hw[0], self.hw[1], self.local_k[0],
                     self.local_k[1])
                    if (mask is not None and self.col_major) else None)
            band_ok = (mask is None
                       or (band is not None and _band_spec(*band) is not None
                           and band[0] * band[1] == n_tok))
            if band_ok:
                bsz = x.shape[0]
                if self.drop_path > 0.0:
                    keep = 1.0 - self.drop_path
                    dm_a = jax.random.bernoulli(
                        self.make_rng("droppath"), keep,
                        (bsz, 1)).astype(jnp.float32) / keep
                    dm_b = jax.random.bernoulli(
                        self.make_rng("droppath"), keep,
                        (bsz, 1)).astype(jnp.float32) / keep
                else:
                    dm_a = dm_b = jnp.ones((bsz, 1), jnp.float32)
                return fused_block_train(x, params, dm_a, dm_b,
                                         num_heads=self.num_heads,
                                         scale=scale, band=band)

        # ---- composed XLA path (training / non-TPU backends / calibration)
        b, n, _ = x.shape
        dp = DropPath(self.drop_path, name="drop_path")

        h = _manual_layer_norm(x, params["norm1_scale"], params["norm1_bias"])
        qkv = project("qkv", h, params["qkv_kernel"], params["qkv_bias"])
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        if self.quant == "calib":
            # int8-attention scales (q recorded post-scale, matching the
            # fused kernel's quantization point)
            record_amax("q", q)
            record_amax("k", k)
            record_amax("v", v)
        band = ((self.hw[0], self.hw[1], self.local_k[0], self.local_k[1])
                if (mask is not None and self.col_major
                    and self.quant == "none") else None)
        if self.is_mutable_collection("intermediates"):
            # Score-envelope calibration (ADVICE r4): the fused kernel's
            # reduction-free softmax clamps scores at SCORE_CLAMP=60 and
            # assumes no real checkpoint reaches it; score_envelope() runs
            # this path on a sample batch to validate that assumption per
            # loaded checkpoint instead of trusting it silently.
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k)
            self.sow("intermediates", "score_max", jnp.max(jnp.abs(s)),
                     reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0))
        attn = _attention_core(q, k, v, mask, band=band)  # [B, h, N, d]
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, n, c)
        attn = project("proj", attn, params["proj_kernel"],
                       params["proj_bias"])
        x = x + dp(attn, train)

        h = _manual_layer_norm(x, params["norm2_scale"], params["norm2_bias"])
        h = _gelu(project("fc1", h, params["fc1_kernel"], params["fc1_bias"]))
        h = project("fc2", h, params["fc2_kernel"], params["fc2_bias"])
        return x + dp(h, train)


class PatchEmbed(nn.Module):
    """Overlapping-conv /4 patch embedding (reference: svtr.py:211-254,
    sub_num=2)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _svtr_conv(self.embed_dim // 2, (3, 3), strides=(2, 2), padding=(1, 1),
                       name="conv1")(x)
        x = _gelu(batch_norm(x, train, name="bn1"), allow_approx=False)
        x = _svtr_conv(self.embed_dim, (3, 3), strides=(2, 2), padding=(1, 1),
                       name="conv2")(x)
        x = _gelu(batch_norm(x, train, name="bn2"), allow_approx=False)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class SubSampleConv(nn.Module):
    """Conv patch merging, stride (2,1) + LayerNorm (reference: svtr.py:265-312,
    types='Conv')."""

    out_dim: int
    hw: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        x = x.reshape(b, self.hw[0], self.hw[1], c)
        x = _svtr_conv(self.out_dim, (3, 3), strides=(2, 1), padding=(1, 1),
                       name="conv")(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, self.out_dim)
        return _layer_norm(name="norm")(x)


class SVTRExtractor(nn.Module):
    """Returns NHWC [B, 1, W/4, out_channels]."""

    out_channels: int = 512
    img_size: Tuple[int, int] = (32, 256)
    embed_dim: Tuple[int, int, int] = (64, 128, 256)
    depth: Tuple[int, int, int] = (3, 6, 3)
    num_heads: Tuple[int, int, int] = (2, 4, 8)
    drop_path_rate: float = 0.1
    quant: str = "none"  # w8a8 PTQ of the block projections (ops.int8)

    @nn.compact
    def __call__(self, x, train: bool = True):
        h0, w0 = self.img_size[0] // 4, self.img_size[1] // 4
        num_patches = h0 * w0
        mixers = ["Local"] * 6 + ["Global"] * 6
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depth))

        x = PatchEmbed(self.embed_dim[0], name="patch_embed")(x, train)
        pos = self.param("pos_embed", _trunc02, (1, num_patches, self.embed_dim[0]))
        x = x + pos

        d0, d1, d2 = self.depth
        # Stages 1-2 run with COLUMN-major tokens: the Local 7x11 window
        # becomes a narrow diagonal band (see local_attention_mask_col_major)
        # that the fused kernel computes banded.  The permutes are exact
        # (plain transposes around the un-ordered block stack); SubSampleConv
        # needs the row-major (H, W) layout, so each stage un-permutes first.
        x = _to_col_major(x, h0, w0)
        for i in range(d0):
            x = Block(self.embed_dim[0], self.num_heads[0], mixers[i], (h0, w0),
                      drop_path=float(dpr[i]), quant=self.quant,
                      col_major=True, name=f"blocks1_{i}")(x, train)
        x = _to_row_major(x, h0, w0)
        x = SubSampleConv(self.embed_dim[1], (h0, w0), name="sub_sample1")(x)

        x = _to_col_major(x, h0 // 2, w0)
        for i in range(d1):
            x = Block(self.embed_dim[1], self.num_heads[1], mixers[d0 + i],
                      (h0 // 2, w0), drop_path=float(dpr[d0 + i]),
                      quant=self.quant, col_major=True,
                      name=f"blocks2_{i}")(x, train)
        x = _to_row_major(x, h0 // 2, w0)
        x = SubSampleConv(self.embed_dim[2], (h0 // 2, w0), name="sub_sample2")(x)

        for i in range(d2):
            x = Block(self.embed_dim[2], self.num_heads[2], mixers[d0 + d1 + i],
                      (h0 // 4, w0), drop_path=float(dpr[d0 + d1 + i]),
                      quant=self.quant, name=f"blocks3_{i}")(x, train)
        x = SubSampleConv(self.out_channels, (h0 // 4, w0), name="sub_sample3")(x)

        b, n, c = x.shape  # n == w0 after the /8 height reduction
        return x.reshape(b, 1, n, c)
