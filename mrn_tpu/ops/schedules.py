"""Learning-rate schedules matching the reference's training envelope.

- ``onecycle_schedule``: torch.optim.lr_scheduler.OneCycleLR with the
  reference hyperparameters (max_lr, div_factor=20, final_div_factor=1000,
  cosine annealing, pct_start=0.3) — reference: il_modules/base.py:97-104.
- ``multistep_schedule``: MultiStepLR / milestone decay
  (reference: il_modules/base.py:110-112, tools/utils.py:169-178).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["onecycle_schedule", "multistep_schedule"]


def onecycle_schedule(max_lr: float, total_steps: int, pct_start: float = 0.3,
                      div_factor: float = 20.0, final_div_factor: float = 1000.0):
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase boundaries (OneCycleLR._schedule_phases)
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def _cos_anneal(start, end, pct):
        pct = jnp.clip(pct, 0.0, 1.0)
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = _cos_anneal(initial_lr, max_lr, step / jnp.maximum(up_end, 1e-8))
        down = _cos_anneal(max_lr, min_lr,
                           (step - up_end) / jnp.maximum(down_end - up_end, 1e-8))
        return jnp.where(step <= up_end, up, down)

    return schedule


def multistep_schedule(lr: float, milestones, drop_rate: float, num_iter: int,
                       fractional: bool = True):
    """Reference ``adjust_learning_rate``: milestones may be fractions of
    num_iter (tools/utils.py:169-178) or absolute steps (MultiStepLR)."""
    bounds = [float(m) * num_iter if fractional else float(m) for m in milestones]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        out = jnp.asarray(lr, jnp.float32)
        for b in bounds:
            out = out * jnp.where(step >= b, drop_rate, 1.0)
        return out

    return schedule
