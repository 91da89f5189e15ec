"""WA — Weight Aligning: LwF-style KD (weight 2) plus post-task rescale of the
new-class fc columns by the old/new mean-norm ratio
(reference: il_modules/wa.py:29-116; align applied in after_task on the
best-checkpoint params, wa.py:34-39 — the in-loop align at wa.py:111 is
overwritten by the checkpoint reload in test(), preserved sequencing)."""

from __future__ import annotations

from mrn_tpu.models.surgery import weight_align
from mrn_tpu.train.learners.base import BaseLearner
from mrn_tpu.train.learners.lwf import LwFMixin


class WA(LwFMixin, BaseLearner):

    kd_weight = 2.0

    def __init__(self, opt):
        super().__init__(opt)
        self.taski = 0

    def _update_representation(self, start_iter, taski, train_loader, valid_loader):
        self.taski = taski
        super()._update_representation(start_iter, taski, train_loader, valid_loader)
        # end-of-training align (wa.py:111); superseded by the ckpt reload in
        # test(), like the reference
        self.params, gamma = weight_align(
            self.params, self._total_classes - self._known_classes)
        self.log.write(f"alignweights,gamma={gamma}\n")

    def after_task(self):
        if self.taski > 0:
            self.params, gamma = weight_align(
                self.params, self._total_classes - self._known_classes)
            self.log.write(f"alignweights,gamma={gamma}\n")
        self._old_model_def = self.model
        super().after_task()
