"""Fused SVTR transformer-block Pallas kernel (inference path).

One program processes a group of images' [N, C] token slices end to end —
LayerNorm -> QKV -> per-head masked attention -> proj -> residual ->
LayerNorm -> MLP (exact-erf GELU) -> residual — entirely in VMEM.  HBM
traffic per block drops from ~20x the activation size (composed ops) to
exactly read-x + write-out; all weights stay VMEM-resident across the grid.

Shapes involved are tiny (N <= 512, C <= 256, hidden <= 1024), so a whole
block's working set is a few MB.  Inference-only: the training path uses the
composed XLA ops (with the pallas attention core) in mrn_tpu.models.svtr.

A w8a8 variant (``_make_kernel_int8``, selected by passing ``quant`` to
``fused_block``) runs the four projections int8 x int8 -> int32 on the MXU
(2x the bf16 OPS on v5e) with per-tensor calibrated activation scales; see
mrn_tpu.ops.int8 for the calibration/quantization flow.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_block"]


# erf(z) = z * P(u) with u an affine map of clamp(z^2): odd minimax
# polynomial, degree 15 in u (Chebyshev-fit on [0, 3.7], converted to the
# shifted monomial basis so f32 Horner stays well-conditioned).  Coefficients
# low -> high.
_ERF_Z0SQ = 3.7 * 3.7
_ERF_COEFS = (
    0.3821374773979187, -0.1904679834842682, 0.14079536497592926,
    -0.11263926327228546, 0.09052307158708572, -0.07047279179096222,
    0.0521380715072155, -0.03618001565337181, 0.023104503750801086,
    -0.013829714618623257, 0.008435077033936977, -0.004555193707346916,
    0.0014333085855469108, -0.0005751904682256281, 0.0007578228251077235,
    -0.0003343276330269873)

# Degree-9 Remez minimax variant of the same P(u): |erf err| < 1.4e-4 in f32
# Horner (dense-grid verified) — GELU abs err <= 0.5*|x|*erf_err < 3.5e-4,
# an order below the bf16 cast applied to the MLP hidden right after (half
# ULP at |h|=1 is 3.9e-3).  The ablation profile (ROUND4.md) put the exact
# degree-15 GELU at 18% of SVTR inference runtime; 7 fewer Horner FMAs cut
# that roughly in half with bit-identical bf16 outputs almost everywhere.
# End-to-end parity vs the degree-15 path is measured on-chip (bench.py
# gelu9 agreement check).
_ERF9_COEFS = (
    0.3821687211819126, -0.1906354404948208, 0.13926991905032793,
    -0.10986806700502608, 0.102285918252448, -0.08351699887774686,
    0.021168399249059538, -0.011215921240360423, 0.05439620276621701,
    -0.03381804338264774)


def _erf_poly(z, coefs=_ERF9_COEFS):
    """Transcendental-free minimax erf — a pure FMA chain: no exp, no
    divide (Pallas TPU has no erf lowering of its own).  Default degree 9
    (|err| < 1.4e-4, below the bf16 cast noise downstream — see _ERF9_COEFS
    note); pass _ERF_COEFS for the degree-15 reference variant (|err| <
    1.9e-7 over ALL f32 inputs, dense-grid verified in
    tests/test_svtr_block.py).  Odd symmetry comes from the final z*
    multiply; |z| > 3.7 saturates via the clip (erfc(3.7) < 1.7e-7)."""
    u = (2.0 / _ERF_Z0SQ) * jnp.minimum(z * z, _ERF_Z0SQ) - 1.0
    p = coefs[-1]
    for c in coefs[-2::-1]:
        p = p * u + c
    return jnp.clip(z * p, -1.0, 1.0)


def _gelu_kernel(x, approximate: bool):
    if approximate:
        return jax.nn.gelu(x, approximate=True)  # tanh form lowers fine
    coefs = (_ERF_COEFS if os.environ.get("SVTR_GELU_DEG") == "15"
             else _ERF9_COEFS)
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5), coefs))


# Ablation knob for attribution profiling (NOT a serving mode): with
# SVTR_ABLATE set, the named phase of the bf16 kernel is replaced by a
# near-free stand-in, so (baseline - ablated) end-to-end bench time
# attributes that phase's true in-situ cost — per-op tracing is unavailable
# through the tunnel and standalone module benches are floored by ~2.3 ms
# dispatch latency.  Values: nogelu | nosoftmax | noln | noscores | nopv |
# noproj (the four C-dim projections — the share a w8a8 int8 path would
# halve on the MXU).
_ABLATE = os.environ.get("SVTR_ABLATE", "")
if _ABLATE:
    # A stray SVTR_ABLATE silently corrupts every accuracy/eval run in the
    # process — make it impossible to miss (ADVICE r4).
    print(f"*** SVTR_ABLATE={_ABLATE!r}: fused SVTR kernel phases replaced "
          "by stand-ins — PROFILING MODE, results are numerically wrong ***",
          file=sys.stderr, flush=True)


# Reduction-free-softmax score clamp: exp is computed without the
# max-subtract, relying on every real checkpoint's scores staying below this.
# Validate per checkpoint with models.svtr.score_envelope (ADVICE r4).
SCORE_CLAMP = 60.0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _band_spec(h: int, w: int, hk: int, wk: int):
    """SVTR_QB-aware wrapper: the env knob is part of the cache key, so
    changing it mid-process cannot serve a stale plan (ADVICE r4)."""
    return _band_spec_impl(h, w, hk, wk,
                           int(os.environ.get("SVTR_QB", "0")))


@functools.lru_cache(maxsize=None)
def _band_spec_impl(h: int, w: int, hk: int, wk: int, min_qb: int):
    """Banded-attention plan for a COLUMN-major Local mask (ROUND4.md design,
    refined by the 128-lane padding analysis): with token = col*h + row the
    hk x wk window lies inside a +/-bw band, bw = (wk//2)*h + hk//2.  Split
    queries into blocks of ``qb`` rows; each block's visible keys fit in a
    ``width``-key window (width = qb + 2*bw rounded up to the 128-lane MXU
    tile, so no rounding is wasted), clipped into [0, N).  Per-block masks
    carry the exact in-window Local pattern, so banded == full masked
    attention (out-of-window entries are exp(-inf) = 0 in the full path).

    Picks the LARGEST qb in {128, 64, 32} with width < N.  Measured bs2048
    end-to-end (v5e, 2026-08): minimizing padded cost N*width instead picks
    qb 32/width 128 for stage 1 — a 4x FLOP cut that is 13% SLOWER than
    qb 64/width 256's 2x cut, because 32-row matmuls fragment the MXU
    pipeline; qb 128 beats qb 64 by a further ~1%.  SVTR stages under this
    rule: (8, 64) -> qb 128, width 256 (2x score/PV cut vs the full 512
    keys); (4, 64) -> qb 64, width 128 (2x vs 256).
    Returns (qb, width, starts, band_mask[N, width]) or None when banding
    cannot beat the full path (window covers all keys)."""
    from mrn_tpu.models.svtr import local_attention_mask_col_major

    n = h * w
    bw = (wk // 2) * h + hk // 2
    best = None
    for qb in (128, 64, 32):
        if n % qb or qb < min_qb:
            continue
        width = _round_up(qb + 2 * bw, 128)
        if width >= n:
            continue
        best = (qb, width)
        break  # qb descending: first hit is the largest viable qb
    if best is None:
        return None
    qb, width = best
    full = local_attention_mask_col_major(h, w, hk, wk)
    starts = tuple(min(max(a * qb - (width - qb) // 2, 0), n - width)
                   for a in range(n // qb))
    band_mask = np.empty((n, width), np.float32)
    for a, st in enumerate(starts):
        band_mask[a * qb:(a + 1) * qb] = full[a * qb:(a + 1) * qb,
                                              st:st + width]
    return qb, width, starts, band_mask


def _make_kernel(group: int, num_heads: int, head_dim: int, scale: float,
                 band=None):
    """bf16 fused block.  The caller pre-folds (host/XLA side, fused_block):
    LN1 scale/shift + the attention q-scale into qkv kernel/bias, LN2
    scale/shift into fc1 kernel/bias — the kernel runs BARE LayerNorms and
    skips the per-element affine passes (VERDICT r4: epilogue folding).

    Softmax runs WITHOUT VPU lane-reductions (the ablation profile put
    softmax at 24% of end-to-end runtime, dominated by the max/sum
    reductions over [H*N, N] rows): exp is fused into the score store
    (no max-subtract — scores are clamped at 60, far above anything a
    trained model produces, and f32 exp is exact-softmax-equivalent under
    any finite clamp that no score reaches), the row-sum rides the PV
    matmul on the MXU via a ones-column appended to V (the [N, head_dim]
    output is lane-padded to 128 anyway, so the extra column is free), and
    the normalize multiply lands on the [N, head_dim] PV output instead of
    the N-times-larger score tensor.  Numerics: P is bf16 both before and
    after this change; normalizing after the matmul divides by the sum of
    the SAME bf16-rounded weights the numerator uses, so the result is an
    exact convex combination.

    ``band`` (Local blocks on column-major tokens, see _band_spec): scores
    and PV run per qb-row query block against a width-key window instead of
    all N keys — identical math, since every key outside the window is
    masked to exp(-inf) = 0 in the full path, and the ones-column row-sum
    over the window equals the full row-sum."""
    c = num_heads * head_dim

    def kernel(x_ref, qkvk_ref, qkvb_ref, pk_ref, pb_ref,
               f1k_ref, f1b_ref, f2k_ref, f2b_ref,
               mask_ref, o_ref, attn_scratch, score_scratch):
        mask = mask_ref[...]
        n = x_ref.shape[1]
        dt = x_ref.dtype

        def ln_bare(x):
            if _ABLATE == "noln":
                return x
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
            return (x - mean) * jax.lax.rsqrt(var + 1e-6)

        # Group-batched projections: the four matmuls and the VPU-heavy
        # LN/GELU run once over [group*N, .] instead of per image — the
        # serial M=N dots were the tick bound, not HBM (README roofline).
        # Only the [N, N]-score attention core stays per image.  The
        # (G, N, C) -> (G*N, C) reshape merges G into the sublane dim
        # (N % 8 == 0), so it is layout-free.
        x = x_ref[...].reshape(group * n, c).astype(jnp.float32)
        h = ln_bare(x)
        if _ABLATE == "noproj":
            # zeros + bias: a lane-contiguous broadcast (a concatenate of h
            # copies relayouts across lanes and costs MORE than the matmul)
            qkv = jnp.zeros((group * n, 3 * c), jnp.float32) + qkvb_ref[...]
        else:
            qkv = jnp.dot(h.astype(dt), qkvk_ref[...],
                          preferred_element_type=jnp.float32) + qkvb_ref[...]
        qb, width, starts = (band if band is not None else (n, n, (0,)))
        nq = n // qb
        for g in range(group):
            rows = slice(g * n, (g + 1) * n)
            # phase 1: all heads' masked scores -> exp -> bf16 [H*N, W]
            # scratch (exp fused into the store; no max-subtract, see
            # docstring).  Banded: per qb-query block against its width-key
            # window (static slices — starts is a compile-time tuple).
            for hd in range(num_heads):
                lo = hd * head_dim
                for a in range(nq):
                    qrows = slice(g * n + a * qb, g * n + (a + 1) * qb)
                    krows = slice(g * n + starts[a],
                                  g * n + starts[a] + width)
                    m_blk = mask[a * qb:(a + 1) * qb, :]
                    if _ABLATE == "noscores":
                        s = m_blk + jnp.zeros((qb, width), jnp.float32)
                    else:
                        q = qkv[qrows, lo:lo + head_dim]  # scale pre-folded
                        k = qkv[krows, c + lo:c + lo + head_dim]
                        s = jax.lax.dot_general(
                            q.astype(dt), k.astype(dt),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) + m_blk
                    if _ABLATE != "nosoftmax":
                        s = jnp.exp(jnp.minimum(s, SCORE_CLAMP))
                    score_scratch[pl.ds(hd * n + a * qb, qb), :] = s.astype(dt)
            # phase 2: all heads' PV; the softmax row-sum is the MXU
            # ones-column, the normalize multiply is [N, head_dim]-sized
            if _ABLATE == "nopv":
                attn_scratch[rows, :] = qkv[rows, 2 * c:].astype(
                    attn_scratch.dtype)
            else:
                ones = jnp.ones((width, 1), dt)
                for hd in range(num_heads):
                    lo = hd * head_dim
                    for a in range(nq):
                        qrows = slice(g * n + a * qb, g * n + (a + 1) * qb)
                        krows = slice(g * n + starts[a],
                                      g * n + starts[a] + width)
                        v = qkv[krows, 2 * c + lo:2 * c + lo + head_dim]
                        v_ext = jnp.concatenate([v.astype(dt), ones], axis=1)
                        o = jnp.dot(
                            score_scratch[pl.ds(hd * n + a * qb, qb), :],
                            v_ext, preferred_element_type=jnp.float32)
                        if _ABLATE != "nosoftmax":
                            # +1e-30 turns an all-underflowed row into zero
                            # attention output instead of 0 * inf = NaN
                            o = (o[:, :head_dim]
                                 * (1.0 / (o[:, head_dim:] + 1e-30)))
                        else:
                            o = o[:, :head_dim]
                        attn_scratch[qrows, lo:lo + head_dim] = o.astype(
                            attn_scratch.dtype)
        if _ABLATE == "noproj":
            attn = attn_scratch[...].astype(jnp.float32) + pb_ref[...]
        else:
            attn = jnp.dot(attn_scratch[...].astype(dt), pk_ref[...],
                           preferred_element_type=jnp.float32) + pb_ref[...]
        x = x + attn
        h = ln_bare(x)
        if _ABLATE == "noproj":
            h = jnp.zeros((group * n, 4 * c), jnp.float32) + f1b_ref[...]
        else:
            h = jnp.dot(h.astype(dt), f1k_ref[...],
                        preferred_element_type=jnp.float32) + f1b_ref[...]
        from mrn_tpu.models.svtr import gelu_approximate
        if _ABLATE != "nogelu":
            h = _gelu_kernel(h, gelu_approximate())
        if _ABLATE == "noproj":
            h = jnp.zeros((group * n, c), jnp.float32) + f2b_ref[...]
        else:
            h = jnp.dot(h.astype(dt), f2k_ref[...],
                        preferred_element_type=jnp.float32) + f2b_ref[...]
        out = x + h
        o_ref[...] = out.reshape(group, n, c).astype(o_ref.dtype)

    return kernel


def _make_kernel_int8(group: int, num_heads: int, head_dim: int,
                      scale: float, attn_int8: bool = False):
    """w8a8 variant: the four projections run int8 x int8 -> int32 on the
    MXU (2x the bf16 OPS on v5e) with per-tensor activation quantization
    (calibrated scales in SMEM) and a float dequant epilogue; LayerNorm and
    softmax stay float.  ``attn_int8`` additionally quantizes the attention
    matmuls (q/k/v with calibrated scales, P with the static [0,1] -> /127
    scale) — head_dim 32 pads the MXU contraction 4x, so QK^T/PV carry a
    tick share far above their FLOP share and int8 halves that cost."""
    c = num_heads * head_dim

    def kernel(x_ref, n1s_ref, n1b_ref, qkvk_ref, qkvb_ref, dqq_ref,
               pk_ref, pb_ref, dqp_ref, n2s_ref, n2b_ref,
               f1k_ref, f1b_ref, dqf1_ref, f2k_ref, f2b_ref, dqf2_ref,
               mask_ref, inv_ref, o_ref, attn_scratch):
        mask = mask_ref[...]

        def ln(x, s_ref, b_ref):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
            y = (x - mean) * jax.lax.rsqrt(var + 1e-6)
            return y * s_ref[...] + b_ref[...]

        def q8(h, idx):
            # symmetric per-tensor int8 with the calibrated scale
            q = jnp.round(h * inv_ref[0, idx])
            return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)

        def body(g, carry):
            x = x_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)  # [N, C]
            h = ln(x, n1s_ref, n1b_ref)
            qkv = jnp.dot(q8(h, 0), qkvk_ref[...],
                          preferred_element_type=jnp.int32)
            qkv = qkv.astype(jnp.float32) * dqq_ref[...] + qkvb_ref[...]
            if attn_int8:
                # dequant scalars recovered from the SMEM inv scales
                s_qk = 1.0 / (inv_ref[0, 4] * inv_ref[0, 5])
                s_pv = 1.0 / (inv_ref[0, 6] * 127.0)
            for hd in range(num_heads):
                lo = hd * head_dim
                q = qkv[:, lo:lo + head_dim] * scale
                k = qkv[:, c + lo:c + lo + head_dim]
                v = qkv[:, 2 * c + lo:2 * c + lo + head_dim]
                if attn_int8:
                    s = jax.lax.dot_general(
                        q8(q, 4), q8(k, 5), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    s = s.astype(jnp.float32) * s_qk + mask
                else:
                    s = jax.lax.dot_general(
                        q.astype(x_ref.dtype), k.astype(x_ref.dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + mask
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                if attn_int8:
                    p8 = jnp.round(p * 127.0).astype(jnp.int8)  # p in [0,1]
                    o = jnp.dot(p8, q8(v, 6),
                                preferred_element_type=jnp.int32)
                    o = o.astype(jnp.float32) * s_pv
                else:
                    o = jnp.dot(p.astype(x_ref.dtype), v.astype(x_ref.dtype),
                                preferred_element_type=jnp.float32)
                attn_scratch[:, lo:lo + head_dim] = o.astype(
                    attn_scratch.dtype)
            attn = jnp.dot(q8(attn_scratch[...], 1), pk_ref[...],
                           preferred_element_type=jnp.int32)
            attn = attn.astype(jnp.float32) * dqp_ref[...] + pb_ref[...]
            x = x + attn
            h = ln(x, n2s_ref, n2b_ref)
            h = jnp.dot(q8(h, 2), f1k_ref[...],
                        preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * dqf1_ref[...] + f1b_ref[...]
            from mrn_tpu.models.svtr import gelu_approximate
            h = _gelu_kernel(h, gelu_approximate())
            h = jnp.dot(q8(h, 3), f2k_ref[...],
                        preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * dqf2_ref[...] + f2b_ref[...]
            out = x + h
            o_ref[pl.ds(g, 1), :, :] = out[None].astype(o_ref.dtype)
            return carry

        jax.lax.fori_loop(0, group, body, 0)

    return kernel


def _pick_group(b, n, c, hidden, itemsize, num_heads=1, score_w=None):
    budget = 10 * 1024 * 1024
    score_w = n if score_w is None else score_w
    # group-batched kernel: x(f32) + qkv(f32, 3C) + attn scratch(f32) +
    # mlp hidden(f32) all live at [group*N, .], plus the bf16 in/out
    # blocks double-buffered
    per_g = (n * c * itemsize * 2 * 2
             + n * (2 * c + 3 * c + c + hidden) * 4)
    fixed = (n * score_w * 4 * 2                    # mask + live score tiles
             + num_heads * n * score_w * itemsize   # per-image exp scratch
             + c * (4 * c + hidden) * itemsize * 2)  # resident weights
    group = max(1, (budget - fixed) // max(per_g, 1))
    group = int(min(group, 8, b))
    while b % group:
        group -= 1
    return group


def fused_block(x, params, mask: Optional[np.ndarray], num_heads: int,
                scale: float, interpret: bool = False, quant=None,
                band: Optional[tuple] = None):
    """x: [B, N, C]; params: the Block param dict; mask: [N, N] additive
    numpy array or None.  ``quant`` (optional): the Block's quant-collection
    dict {act_amax_<p>, w_scale_<p> for p in qkv/proj/fc1/fc2} — switches
    the four projections to the w8a8 int8-MXU path (params then hold int8
    kernels, produced by ops.int8.quantize_variables).  ``band`` (optional):
    (h, w, hk, wk) geometry of a COLUMN-major Local mask — enables the
    banded score/PV path (_band_spec) on the bf16 kernel; the int8 kernel
    keeps the full mask (disable with SVTR_BAND=0 for A/B)."""
    b, n, c = x.shape
    hidden = params["fc1_kernel"].shape[1]
    head_dim = c // num_heads
    mask_arr = (np.zeros((n, n), np.float32) if mask is None
                else np.asarray(mask, np.float32))
    spec = None
    if (band is not None and quant is None
            and os.environ.get("SVTR_BAND", "1") != "0"
            and band[0] * band[1] == n):
        spec = _band_spec(*band)
    score_w = spec[1] if spec is not None else n
    group = _pick_group(b, n, c, hidden, x.dtype.itemsize,
                        num_heads=num_heads, score_w=score_w)

    def vec(name, rows=1):
        p = params[name]
        return p.reshape(1, -1)

    x_spec = pl.BlockSpec((group, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def wspec(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=space)

    if quant is not None:
        from mrn_tpu.models.svtr import attention_int8

        attn_int8 = attention_int8()
        # host-side dequant prep: per-projection act scale s = amax/127,
        # quant multiplier 1/s (SMEM), dequant row s * w_scale[out] (VMEM);
        # slots 4-6 carry the q/k/v inv scales for the int8-attention mode
        inv_s, deq = [], {}
        for qname in ("qkv", "proj", "fc1", "fc2"):
            s = jnp.maximum(quant[f"act_amax_{qname}"].astype(jnp.float32),
                            1e-12) / 127.0
            inv_s.append(1.0 / s)
            deq[qname] = (s * quant[f"w_scale_{qname}"].astype(jnp.float32)
                          ).reshape(1, -1)
        for qname in ("q", "k", "v"):
            amax = quant.get(f"act_amax_{qname}",
                             jnp.zeros((), jnp.float32))
            s = jnp.maximum(jnp.asarray(amax, jnp.float32), 1e-12) / 127.0
            inv_s.append(1.0 / s)
        inv_s.append(jnp.zeros((), jnp.float32))  # pad to 8
        inv_arr = jnp.stack(inv_s).reshape(1, 8)

        def frow(name):  # float32 bias row (params may be bf16)
            return params[name].astype(jnp.float32).reshape(1, -1)

        weights = [
            vec("norm1_scale"), vec("norm1_bias"),
            params["qkv_kernel"], frow("qkv_bias"), deq["qkv"],
            params["proj_kernel"], frow("proj_bias"), deq["proj"],
            vec("norm2_scale"), vec("norm2_bias"),
            params["fc1_kernel"], frow("fc1_bias"), deq["fc1"],
            params["fc2_kernel"], frow("fc2_bias"), deq["fc2"],
        ]
        in_specs = ([x_spec] + [wspec(w.shape) for w in weights]
                    + [wspec(mask_arr.shape),
                       wspec((1, 8), space=pltpu.SMEM)])
        return pl.pallas_call(
            _make_kernel_int8(group, num_heads, head_dim, scale,
                              attn_int8=attn_int8),
            grid=(b // group,),
            in_specs=in_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
            scratch_shapes=[pltpu.VMEM((n, c), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, *weights, jnp.asarray(mask_arr), inv_arr)

    # Epilogue folding (f32, traced outside the kernel — a [C, .] elementwise
    # op per call, negligible): LN scale/shift and the attention q-scale move
    # into the qkv/fc1 weights so the kernel runs bare LayerNorms:
    #   LN(x)@W + b  ==  normalize(x) @ (s[:,None]*W) + (b + ln_bias@W)
    def fold(kernel_name, bias_name, s_name, b_name, extra_scale=None):
        w = params[kernel_name].astype(jnp.float32)
        s = params[s_name].astype(jnp.float32)
        lb = params[b_name].astype(jnp.float32)
        wf = s[:, None] * w
        bf = params[bias_name].astype(jnp.float32) + lb @ w
        if extra_scale is not None:
            wf = wf * extra_scale
            bf = bf * extra_scale
        return wf.astype(x.dtype), bf.reshape(1, -1)

    # q-third of qkv additionally absorbs the attention scale
    qscale = jnp.concatenate([jnp.full((c,), scale, jnp.float32),
                              jnp.ones((2 * c,), jnp.float32)])
    qkvk_f, qkvb_f = fold("qkv_kernel", "qkv_bias",
                          "norm1_scale", "norm1_bias", extra_scale=qscale)
    f1k_f, f1b_f = fold("fc1_kernel", "fc1_bias",
                        "norm2_scale", "norm2_bias")

    kernel_band = None
    if spec is not None:
        qb, width, starts, band_mask = spec
        kernel_band = (qb, width, starts)
        mask_arr = band_mask

    weights = [
        qkvk_f, qkvb_f,
        params["proj_kernel"], vec("proj_bias"),
        f1k_f, f1b_f,
        params["fc2_kernel"], vec("fc2_bias"),
    ]
    in_specs = [x_spec] + [wspec(w.shape) for w in weights] + \
               [wspec(mask_arr.shape)]

    out = pl.pallas_call(
        _make_kernel(group, num_heads, head_dim, scale, band=kernel_band),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((group * n, c), jnp.float32),
                        pltpu.VMEM((num_heads * n, score_w), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *weights, jnp.asarray(mask_arr))
    return out
