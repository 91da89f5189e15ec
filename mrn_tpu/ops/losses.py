"""Classification / distillation losses used by the prediction heads and IL
strategies.

- ``cross_entropy_ignore``: torch.nn.CrossEntropyLoss(ignore_index=[PAD])
  for the Attn head (reference: il_modules/base.py:133-137).
- ``kd_loss``: the LwF/WA knowledge-distillation loss ``_KD_loss``
  (reference: il_modules/lwf.py:111-114, wa.py:113-116): softened soft-target
  cross entropy summed over classes, averaged over rows.
- ``cross_entropy_dense``: plain mean CE over int targets (the MRN router's
  ``taski_criterion``, reference: il_modules/mrn.py:150-152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy_ignore", "cross_entropy_dense", "kd_loss"]


def cross_entropy_ignore(logits, targets, ignore_index: int):
    """Mean CE over positions whose target != ignore_index.

    logits: [..., C]; targets: [...] int32. Matches torch's
    CrossEntropyLoss(reduction='mean', ignore_index=...) (sum of losses over
    kept positions / number of kept positions).
    """
    logits2 = logits.reshape(-1, logits.shape[-1])
    targets1 = targets.reshape(-1)
    logp = jax.nn.log_softmax(logits2, axis=-1)
    picked = jnp.take_along_axis(logp, targets1[:, None].astype(jnp.int32), axis=1)[:, 0]
    keep = (targets1 != ignore_index).astype(logits.dtype)
    total = -(picked * keep).sum()
    count = jnp.maximum(keep.sum(), 1.0)
    return total / count


def cross_entropy_dense(logits, targets):
    """Mean CE over all rows. logits: [B, C]; targets: [B] int32."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32), axis=1)[:, 0]
    return -picked.mean()


def kd_loss(pred_logits, soft_logits, temperature: float = 2.0):
    """-(softmax(soft/T) * log_softmax(pred/T)).sum() / rows
    over the first `known_classes` slice chosen by the caller."""
    pred = jax.nn.log_softmax(pred_logits / temperature, axis=1)
    soft = jax.nn.softmax(soft_logits / temperature, axis=1)
    return -(soft * pred).sum() / pred.shape[0]
