"""EWC — Elastic Weight Consolidation: diagonal Fisher information penalty
(reference: il_modules/ewc.py:27-167): Fisher accumulated over
``fisher_num_iter`` batches of squared recognition-loss gradients, clamped at
fishermax=1e-4, alpha=0.5-blended across tasks over the shared parameter
prefix; training loss = CLF + 1000 * sum(F * (theta - theta*)^2) / 2.

The Fisher accumulation reuses the jitted grad of the recognition loss — it
is the same train step minus the optimizer update."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.train.learners.base import BaseLearner
from mrn_tpu.train.steps import recognition_loss

LAMDA = 1000.0
FISHERMAX = 0.0001
ALPHA = 0.5
FISHER_NUM_ITER = 5000


def _slice_like(cur, ref):
    """theta[:len(theta*)] in torch slices the OUTPUT axis of grown leaves;
    in flax layouts that is axis 1 for dense kernels, axis 0 for biases/
    embeddings.  Leaves with equal shapes pass through."""
    if cur.shape == ref.shape:
        return cur
    slices = tuple(slice(0, ref.shape[d]) for d in range(cur.ndim))
    return cur[slices]


class EWC(BaseLearner):

    def __init__(self, opt):
        super().__init__(opt)
        self.fisher = None
        self.mean = None

    def after_task(self):
        # EWC keeps no old network (ewc.py:32-35)
        self._known_classes = self._total_classes

    def train_aux(self):
        if self.fisher is None:
            return None
        return {"fisher": self.fisher, "mean": self.mean}

    def loss_fn(self, params, batch_stats, batch, rng, aux):
        rec = recognition_loss(self.opt.Prediction, self._pad_id())
        preds, new_stats = self._apply_train(params, batch_stats, batch, rng)
        loss_clf = rec(preds, batch)
        if aux is None:
            return loss_clf, (new_stats, {})
        penalty = 0.0
        fisher_flat = jax.tree_util.tree_leaves(aux["fisher"])
        mean_flat = jax.tree_util.tree_leaves(aux["mean"])
        param_flat = jax.tree_util.tree_leaves(params)
        for f, m, p in zip(fisher_flat, mean_flat, param_flat):
            penalty = penalty + jnp.sum(f * (_slice_like(p, m) - m) ** 2) / 2.0
        loss = loss_clf + LAMDA * penalty
        return loss, (new_stats, {"ewc": penalty})

    def _train(self, start_iter, taski, train_loader, valid_loader):
        super()._train(start_iter, taski, train_loader, valid_loader)
        self._update_fisher(train_loader)

    def _after_resume(self, taski, train_loader):
        """start_task resume: recompute this task's Fisher from the loaded
        checkpoint's params so later tasks still train with the penalty.
        The reference LOSES the Fisher on resume (it is computed only at the
        _train tail, il_modules/ewc.py:47-57, which start_task skips,
        base.py:178-195) — resumed reference EWC silently degrades to the
        base learner; the rebuild repairs the state instead."""
        if taski == 0 and not getattr(train_loader, "loaders", None):
            train_loader.get_dataset(taski, memory=None)
        self._update_fisher(train_loader)

    def _update_fisher(self, train_loader):
        new_fisher = self.get_fisher_diagonal(train_loader)
        if self.fisher is None:
            self.fisher = new_fisher
        else:
            # alpha-blend over the shared prefix (ewc.py:50-56)
            def blend(new, old):
                sl = tuple(slice(0, old.shape[d]) for d in range(new.ndim))
                return new.at[sl].set(ALPHA * old + (1 - ALPHA) * new[sl])
            self.fisher = jax.tree_util.tree_map(blend, new_fisher, self.fisher)
        self.mean = jax.tree_util.tree_map(jnp.array, self.params)

    def get_fisher_diagonal(self, train_loader):
        """(reference: ewc.py:128-167)"""
        num_iter = int(self.opt.get("fisher_num_iter", FISHER_NUM_ITER))
        rec = recognition_loss(self.opt.Prediction, self._pad_id())

        def grad_sq(params, batch_stats, batch, rng):
            def pure_loss(p):
                preds, _ = self._apply_train(p, batch_stats, batch, rng)
                return rec(preds, batch)
            g = jax.grad(pure_loss)(params)
            return jax.tree_util.tree_map(lambda x: x * x, g)

        grad_sq = jax.jit(grad_sq)
        fisher = jax.tree_util.tree_map(jnp.zeros_like, self.params)
        for _ in range(num_iter):
            images, labels = train_loader.get_batch()
            batch = self._encode_batch(images, labels)
            sq = grad_sq(self.params, self.batch_stats, batch, self._next_rng())
            fisher = jax.tree_util.tree_map(lambda a, b: a + b, fisher, sq)
        fisher = jax.tree_util.tree_map(
            lambda f: jnp.minimum(f / num_iter, FISHERMAX), fisher)
        return fisher
