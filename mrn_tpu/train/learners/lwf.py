"""LwF — Learning without Forgetting: knowledge distillation from the frozen
previous-task network over the first known_classes logits
(reference: il_modules/lwf.py:26-114; total loss = 3 * KD(T=2) + CLF;
start_index 0 for CTC, 1 for Attn — lwf.py:59-87)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mrn_tpu.ops.losses import kd_loss
from mrn_tpu.train.learners.base import BaseLearner
from mrn_tpu.train.steps import recognition_loss

T = 2.0
LAMDA = 3.0


class LwFMixin:
    """Shared KD machinery for LwF/WA: old-network forward on the SAME batch
    (old net in eval mode: running BN stats, teacher forcing for Attn —
    lwf.py:62-71)."""

    kd_weight = LAMDA

    def _old_forward(self, batch, aux):
        kwargs = {}
        if self.opt.Prediction == "Attn":
            kwargs["text"] = batch["label"][:, :-1]
        out = self._old_model_def.apply(
            {"params": self._mp_cast(aux["old_params"]),
             "batch_stats": aux["old_stats"]},  # f32 stats; output stays bf16
            self._mp_cast(batch["image"]), train=False, is_train=True, **kwargs)
        return self._mp_f32(out["predict"])

    def train_aux(self):
        if self._cur_task == 0 or self._old_params is None:
            return None
        return {"old_params": self._old_params, "old_stats": self._old_batch_stats}

    def loss_fn(self, params, batch_stats, batch, rng, aux):
        rec = recognition_loss(self.opt.Prediction, self._pad_id())
        preds, new_stats = self._apply_train(params, batch_stats, batch, rng)
        loss_clf = rec(preds, batch)
        if aux is None:
            return loss_clf, (new_stats, {})
        start = 0 if "CTC" in self.opt.Prediction else 1
        old_preds = self._old_forward(batch, aux)
        known = self._known_classes
        loss_kd = kd_loss(
            preds.reshape(-1, preds.shape[-1])[:, start:known],
            old_preds.reshape(-1, old_preds.shape[-1])[:, start:known], T)
        loss = self.kd_weight * loss_kd + loss_clf
        return loss, (new_stats, {"kd": loss_kd})


class LwF(LwFMixin, BaseLearner):

    def after_task(self):
        # snapshot the frozen old network INCLUDING its module definition
        # (its class count differs from next task's model)
        self._old_model_def = self.model
        super().after_task()
