"""Joint learner — the non-incremental upper bound: trains once on all tasks
(joint_mix: one concatenated stream; joint_loader: per-task loaders each
batch_size/T) and evaluates every task at each val_interval
(reference: il_modules/joint.py:9-106)."""

from __future__ import annotations

from mrn_tpu.train.learners.base import BaseLearner


class JointLearner(BaseLearner):

    def incremental_train(self, taski, character, train_loader, valid_loader,
                          valid_datas=None, val_dataset_builder=None):
        self._cur_task = taski
        self.character = character
        self.converter = self.build_converter()
        valid = valid_loader.create_list_dataset(valid_datas=valid_datas)

        if taski > 0:
            self.change_model()
        else:
            self.build_model()
        self.count_param()
        self.build_optimizer()

        self._joint_valid_datas = valid_datas
        self._joint_val_builder = val_dataset_builder
        self._joint_scores = ([], [])

        self._init_train(0, taski, train_loader, valid)
        return self._joint_scores

    def _init_train(self, start_iter, taski, train_loader, valid_loader):
        best_scores, ned_scores = self._joint_scores

        def val_hook(valid, iteration, train_loss_avg, start_time):
            self.val(valid, self.opt, self.best_score, start_time, iteration,
                     train_loss_avg, taski)
            # evaluate all tasks at each interval except the very first step
            if iteration != 1 and self._joint_val_builder is not None:
                self.test(self._joint_valid_datas, best_scores, ned_scores,
                          taski, val_dataset_builder=self._joint_val_builder)

        self._run_loop(start_iter, taski, train_loader, valid_loader,
                       val_hook=val_hook)
