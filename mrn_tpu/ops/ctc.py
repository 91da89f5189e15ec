"""CTC loss with torch.nn.CTCLoss semantics (the reference's criterion,
il_modules/base.py:128-137):

- blank id 0 (the converter pins [CTCblank] at index 0),
- 'mean' reduction = mean over batch of (per-sample loss / target length),
- zero_infinity=True: infeasible alignments contribute 0 loss and 0 grad.

Built on optax's TPU-friendly CTC forward (a lax.scan over the alpha lattice —
statically shaped, fuses fine under jit); this wrapper only adapts reduction
and masking semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["ctc_loss", "ctc_loss_per_sample"]


def ctc_loss_per_sample(logits, labels, label_lengths, blank_id: int = 0):
    """Per-sample negative log likelihood.

    logits: [B, T, C] unnormalized scores (full time dimension is valid —
    the pipeline always produces fixed T).
    labels: [B, N] int32 (padded with any id beyond label_lengths).
    label_lengths: [B] int32.
    """
    b, t, _ = logits.shape
    n = labels.shape[1]
    logit_paddings = jnp.zeros((b, t), dtype=logits.dtype)
    pos = jnp.arange(n)[None, :]
    label_paddings = (pos >= label_lengths[:, None]).astype(logits.dtype)
    per_sample = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                                blank_id=blank_id)
    return per_sample


def ctc_loss(logits, labels, label_lengths, blank_id: int = 0,
             zero_infinity: bool = True):
    """torch-compatible 'mean' reduction CTC loss (scalar)."""
    per_sample = ctc_loss_per_sample(logits, labels, label_lengths, blank_id)
    denom = jnp.maximum(label_lengths.astype(per_sample.dtype), 1.0)
    per_sample = per_sample / denom
    if zero_infinity:
        # torch produces inf for infeasible alignments (T < len + repeats) and
        # zero_infinity zeroes them; optax instead returns a large finite value
        # (log_epsilon-based), so mask infeasibility explicitly.
        t = logits.shape[1]
        n = labels.shape[1]
        pos = jnp.arange(1, n)[None, :]
        within = pos < label_lengths[:, None]
        repeats = jnp.sum((labels[:, 1:] == labels[:, :-1]) & within, axis=1)
        feasible = (label_lengths + repeats) <= t
        per_sample = jnp.where(feasible & jnp.isfinite(per_sample), per_sample, 0.0)
    return jnp.mean(per_sample)
