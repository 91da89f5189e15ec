"""Jitted train/eval step factories.

One jitted ``train_step`` per (architecture, num_classes[, num_experts])
signature — IL strategies compose extra loss terms around the same
recognition loss (reference hot loop: il_modules/base.py:217-273).
Recompiling at task boundaries (<= 6 times per run) is free relative to the
10k steps per task.

Data parallelism: steps are jitted with sharding annotations supplied by
mrn_tpu.parallel.mesh — the batch axis is sharded across devices and XLA
inserts the gradient all-reduce (the TPU-native replacement for
torch.nn.DataParallel, reference il_modules/base.py:68).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mrn_tpu.ops.ctc import ctc_loss
from mrn_tpu.ops.losses import cross_entropy_ignore

__all__ = ["TrainState", "recognition_loss", "make_train_step", "make_eval_step"]


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def recognition_loss(prediction: str, pad_id: int):
    """The reference's recognition loss: CTC on log-softmax over full-T preds
    (base.py:241-246) or CE ignoring [PAD] on targets without [SOS]
    (base.py:247-251).  ``batch`` carries 'label' ([B, N]) and 'length'."""

    if "CTC" in prediction:
        def loss(preds, batch):
            return ctc_loss(preds, batch["label"], batch["length"])
    else:
        def loss(preds, batch):
            target = batch["label"][:, 1:]  # drop [SOS]
            return cross_entropy_ignore(preds, target, pad_id)
    return loss


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    donate: bool = True, grad_transform: Optional[Callable] = None):
    """loss_fn(params, batch_stats, batch, rng, aux) ->
       (loss, (new_batch_stats, metrics_dict)).
    ``aux`` carries task-level constants that change between tasks but not
    between steps (old-network snapshot for LwF/WA, Fisher+mean for EWC) as
    real arguments so they are device-resident, not baked into the program.
    ``grad_transform`` post-processes raw grads (e.g. zeroing frozen expert
    slices inside stacked leaves, where leaf-level optax masks can't reach).
    Returns jitted step(state, batch, rng, aux) -> (state, metrics)."""

    def step(state: TrainState, batch, rng, aux):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng,
                                   aux)
        if grad_transform is not None:
            grads = grad_transform(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return TrainState(new_params, new_stats, new_opt_state,
                          state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable):
    """apply_fn(params, batch_stats, batch) -> logits [B, T, C]; jitted,
    also returns greedy indices and per-step max probs so the host only does
    string work (reference: test.py:210-220)."""

    def step(params, batch_stats, batch):
        logits = apply_fn(params, batch_stats, batch)
        probs = jax.nn.softmax(logits, axis=2)
        max_probs = jnp.max(probs, axis=2)
        preds_index = jnp.argmax(logits, axis=2).astype(jnp.int32)
        return logits, preds_index, max_probs

    return jax.jit(step)
