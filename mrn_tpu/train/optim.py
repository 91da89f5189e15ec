"""Optimizer construction matching the reference envelope
(reference: il_modules/base.py:72-115): sgd / adadelta / adam, OneCycle
("super") or multistep schedules, and global-norm gradient clipping at
grad_clip=5 applied before the update (base.py:255-258).

Frozen subsets (old experts, frozen extractors) are handled with
``optax.masked`` zero-updates rather than parameter filtering, so pytree
structure stays stable across tasks.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from mrn_tpu.ops.schedules import multistep_schedule, onecycle_schedule

__all__ = ["build_optimizer", "build_schedule"]


def build_schedule(opt, scale: float = 1.0, the: int = 1):
    """'super' -> OneCycle over num_iter * the steps (MRN's step-1 loop uses
    the=2, il_modules/mrn.py:312); otherwise the reference's fractional
    milestone decay (tools/utils.py:169-178)."""
    if "super" in str(opt.schedule):
        return onecycle_schedule(opt.lr * scale, int(opt.num_iter) * the)
    return multistep_schedule(opt.lr * scale, opt.schedule if isinstance(opt.schedule, (list, tuple)) else opt.milestones,
                              opt.lr_drop_rate, int(opt.num_iter))


def build_optimizer(opt, schedule, trainable_mask=None) -> optax.GradientTransformation:
    name = opt.optimizer
    if name == "sgd":
        inner = optax.chain(
            optax.add_decayed_weights(opt.sgd_weight_decay),
            optax.sgd(learning_rate=schedule, momentum=opt.sgd_momentum),
        )
    elif name == "adadelta":
        inner = optax.adadelta(learning_rate=schedule, rho=opt.rho, eps=opt.eps)
    elif name == "adam":
        inner = optax.adam(learning_rate=schedule)
    else:
        raise ValueError(f"unknown optimizer {name}")

    tx = optax.chain(
        optax.clip_by_global_norm(opt.grad_clip),
        inner,
    )
    if trainable_mask is not None:
        tx = optax.chain(optax.masked(optax.set_to_zero(),
                                      jax.tree_util.tree_map(lambda m: not m, trainable_mask)),
                         tx)
    return tx
