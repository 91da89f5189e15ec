"""BaseLearner: the sequential-finetuning IL strategy and the shared training
lifecycle for all learners (reference: il_modules/base.py:26-467).

Functional JAX redesign of the reference's in-place learner:
- model (re)builds are pytree surgery between jit regions
  (mrn_tpu.models.surgery), not module mutation;
- the 10k-iteration hot loop runs ONE jitted train step (forward+backward+
  clip+Adam+OneCycle) per iteration, with the batch sharded over the device
  mesh when data_parallel > 1;
- rehearsal-memory bookkeeping, validation, checkpointing and the MLT17/19
  score aggregation match the reference's policies line for line.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.codec import build_converter
from mrn_tpu.models.composer import build_recognizer
from mrn_tpu.models.surgery import apply_reference_init, count_params, grow_fc
from mrn_tpu.parallel.mesh import shard_batch
from mrn_tpu.train.checkpoint import (best_model_path, load_model, save_model,
                                      load_train_state, save_train_state,
                                      train_state_path)
from mrn_tpu.train.evaluate import validation
from mrn_tpu.train.optim import build_optimizer, build_schedule
from mrn_tpu.train.steps import TrainState, make_train_step, recognition_loss
from mrn_tpu.utils import Averager, ExperimentLog
from mrn_tpu.utils.profiling import StepMeter
from mrn_tpu.ops.ctc import ctc_loss_per_sample
from mrn_tpu.ops.losses import cross_entropy_ignore


class BaseLearner:
    def __init__(self, opt):
        self._cur_task = -1
        self._known_classes = 0
        self._total_classes = 0
        self.opt = opt
        self.character = None
        self.converter = None
        self.memory_index: List[np.ndarray] = []
        self.model = None
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self.tx = None
        self._train_step = None
        self._old_params = None      # frozen old-network snapshot (LwF/WA)
        self._old_batch_stats = None
        self.log = ExperimentLog(opt.exp_name, opt.get("output_dir", "./saved_models"),
                                 opt.get("data_log", "./data_any.txt"),
                                 echo=opt.get("echo_logs", False))
        self.rng = jax.random.PRNGKey(opt.manual_seed)
        self.np_rng = np.random.default_rng(opt.manual_seed)

    # ------------------------------------------------------------------ setup

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def build_converter(self):
        converter = build_converter(self.opt.Prediction, self.character)
        self._total_classes = converter.num_classes
        return converter

    def _dummy_batch(self):
        opt = self.opt
        image = jnp.zeros((2, opt.imgH, opt.imgW, opt.input_channel), jnp.float32)
        if opt.Prediction == "Attn":
            text = jnp.zeros((2, opt.batch_max_length + 2), jnp.int32)
        else:
            text = None
        return image, text

    def _init_variables(self, model):
        image, text = self._dummy_batch()
        kwargs = {"text": text[:, :-1]} if text is not None else {}
        return model.init({"params": self._next_rng(), "droppath": self._next_rng()},
                          image, train=False, **kwargs)

    def build_model(self):
        """Task-0 model build + reference init pass (base.py:45-68)."""
        self.model = build_recognizer(self.opt, self._total_classes)
        variables = self._init_variables(self.model)
        self.params = apply_reference_init(variables["params"], self._next_rng())
        self.batch_stats = variables.get("batch_stats", {})

    def change_model(self):
        """Grow the classifier; keep extractor params/stats; prediction head
        modules created fresh keep their construction init (base.py:139-149,
        model.py:150-189)."""
        old_params, old_stats = self.params, self.batch_stats
        self.model = build_recognizer(self.opt, self._total_classes)
        variables = self._init_variables(self.model)
        new_params = variables["params"]
        # carry over the extractor wholesale
        new_params = dict(new_params)
        new_params["extractor"] = old_params["extractor"]
        new_params = grow_fc(new_params, old_params, path=("fc",))
        # NOTE: the Attn decoder ('prediction') is re-initialized each task in
        # the reference (build_prediction creates a new Attention); keep fresh.
        self.params = new_params
        self.batch_stats = old_stats
        self.opt_state = None

    def trainable_mask(self):
        """True where trainable; base learner trains everything."""
        return jax.tree_util.tree_map(lambda _: True, self.params)

    def build_optimizer(self, scale: float = 1.0, the: int = 1):
        schedule = build_schedule(self.opt, scale=scale, the=the)
        self.tx = build_optimizer(self.opt, schedule, self.trainable_mask())
        self.opt_state = self.tx.init(self.params)
        self._train_step = None  # force rebuild against new tx

    # ------------------------------------------------------------- loss/steps

    def _mp_dtype(self):
        """Mixed-precision training policy (opt.train_dtype="bf16", or
        train.py --bf16): forward/backward run in bf16, master params /
        optimizer state / BN running stats / losses stay f32.  Default: off
        (full f32, matching the reference)."""
        import jax.numpy as jnp
        return jnp.bfloat16 if self.opt.get("train_dtype") == "bf16" else None

    def _mp_cast(self, tree):
        dt = self._mp_dtype()
        if dt is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)

    def _mp_f32(self, tree):
        """Cast a subtree back to f32 (mutated BN stats, logits for losses)."""
        if self._mp_dtype() is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)

    def _apply_train(self, params, batch_stats, batch, rng):
        """Returns (predict, new_batch_stats)."""
        kwargs = {}
        if self.opt.Prediction == "Attn":
            kwargs["text"] = batch["label"][:, :-1]
        # batch_stats stay f32: train-mode BN ignores them for normalization,
        # and a bf16-rounded EMA base would quantize the running stats.
        out, mutated = self.model.apply(
            {"params": self._mp_cast(params),
             "batch_stats": batch_stats},
            self._mp_cast(batch["image"]),
            train=True, mutable=["batch_stats"], rngs={"droppath": rng}, **kwargs)
        return self._mp_f32(out["predict"]), self._mp_f32(mutated["batch_stats"])

    def loss_fn(self, params, batch_stats, batch, rng, aux):
        rec = recognition_loss(self.opt.Prediction, self._pad_id())
        preds, new_stats = self._apply_train(params, batch_stats, batch, rng)
        loss = rec(preds, batch)
        return loss, (new_stats, {})

    def train_aux(self):
        """Task-level device constants threaded into the jitted step."""
        return None

    def _pad_id(self):
        return self.converter.pad_id

    def grad_transform(self):
        """Optional raw-grad post-processing (stacked-leaf freezing)."""
        return None

    def get_train_step(self):
        if self._train_step is None:
            self._train_step = make_train_step(self.loss_fn, self.tx,
                                               grad_transform=self.grad_transform())
        return self._train_step

    def _device_images(self, images):
        """Host image batches move to device as-is; int32 batches are indices
        into the device-resident image bank (opt.image_bank) — gather +
        normalize are dispatched as device ops, so nothing but the indices
        crosses the host-device link."""
        images = np.asarray(images)
        if np.issubdtype(images.dtype, np.integer):
            bank = self.opt.get("image_bank")
            if bank is None:
                raise ValueError("bank-index batch but opt.image_bank is unset")
            if hasattr(bank, "as_device_array"):  # growable DeviceImageBank
                bank = bank.as_device_array()
            img = jnp.take(bank, shard_batch(jnp.asarray(images)), axis=0)
            return (img.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        return shard_batch(jnp.asarray(images))

    def _encode_batch(self, images, labels):
        labels_index, lengths = self.converter.encode(
            labels, batch_max_length=self.opt.batch_max_length)
        return {
            "image": self._device_images(images),
            "label": jnp.asarray(labels_index),
            "length": jnp.asarray(lengths),
        }

    # ------------------------------------------------------------------ train

    def incremental_train(self, taski, character, train_loader, valid_loader):
        """(reference: il_modules/base.py:156-204)"""
        self._cur_task = taski
        self.character = character
        self.converter = self.build_converter()
        valid = valid_loader.create_dataset()

        if taski > 0:
            self.change_model()
        else:
            self.build_model()
        self.count_param()
        self.build_optimizer()

        if self.opt.start_task > taski:
            if taski > 0:
                if self.opt.memory is not None:
                    self.build_rehearsal_memory(train_loader, taski)
                else:
                    train_loader.get_dataset(taski, memory=self.opt.memory)
            self._load_best(taski)
            # learner-specific state that the skipped _train would have
            # produced (e.g. EWC's Fisher — lost by the reference on resume)
            self._after_resume(taski, train_loader)
        else:
            self.log.write(f"Task {taski} start training ------{self.opt.exp_name}------\n")
            self._train(0, taski, train_loader, valid)

    def _train(self, start_iter, taski, train_loader, valid_loader):
        if taski == 0:
            self._init_train(start_iter, taski, train_loader, valid_loader)
        else:
            if self.opt.memory is not None:
                self.build_rehearsal_memory(train_loader, taski)
            else:
                train_loader.get_dataset(taski, memory=self.opt.memory)
            self._update_representation(start_iter, taski, train_loader, valid_loader)

    def _run_loop(self, start_iter, taski, train_loader, valid_loader,
                  num_iter=None, get_batch=None, val_hook=None, step=None,
                  val_interval=None):
        """Shared hot loop (reference: base.py:217-273)."""
        num_iter = num_iter or self.opt.num_iter
        val_interval = val_interval or self.opt.val_interval
        get_batch = get_batch or train_loader.get_batch
        train_loss_avg = Averager()
        start_time = time.time()
        self.best_score = -1.0
        start_iter = self._maybe_resume_full(start_iter, taski, step,
                                             train_loader)
        state = TrainState(self.params, self.batch_stats, self.opt_state,
                           jnp.asarray(start_iter, jnp.int32))
        train_step = self.get_train_step()
        aux = self.train_aux()
        meter = StepMeter()

        prefetcher = None
        if self.opt.get("prefetch", True):
            from mrn_tpu.data.prefetch import Prefetcher
            prefetcher = Prefetcher(get_batch, depth=2)
            get_batch = prefetcher

        pending_losses = []
        for iteration in range(start_iter + 1, num_iter + 1):
            fetched = get_batch()
            batch = self._encode_batch(fetched[0], fetched[1])
            if len(fetched) > 2:
                batch["dataset_idx"] = jnp.asarray(fetched[2])
            state, metrics = train_step(state, batch, self._next_rng(), aux)
            # keep the loss as an async device value: forcing it every step
            # would serialize the loop on a host<->device round-trip per
            # iteration (dispatch stays pipelined; syncing a 64-step-old loss
            # bounds the in-flight queue without stalling the pipeline)
            # learners may designate a component loss for the log (MRN's
            # router phase logs the CLF part, matching the reference's
            # Train_loss_clf, il_modules/mrn.py:420)
            pending_losses.append(metrics.get("log_loss", metrics["loss"]))
            if len(pending_losses) > 64:
                train_loss_avg.add(np.asarray(pending_losses.pop(0)))
            meter.tick(len(fetched[1]))

            if iteration % val_interval == 0 or iteration == 1 or iteration == num_iter:
                if pending_losses:
                    for loss in np.asarray(jnp.stack(pending_losses)):
                        train_loss_avg.add(loss)
                    pending_losses = []
                self.log.write(f"[{iteration}/{num_iter}] {meter.report()}\n")
                meter.reset()
                self.params, self.batch_stats, self.opt_state = \
                    state.params, state.batch_stats, state.opt_state
                if val_hook is not None:
                    val_hook(valid_loader, iteration, train_loss_avg, start_time)
                else:
                    self.val(valid_loader, self.opt, self.best_score, start_time,
                             iteration, train_loss_avg, taski, step=step)
                train_loss_avg.reset()
                if self.opt.get("full_ckpt") and iteration < num_iter:
                    self._save_full_state(taski, step, iteration, state,
                                          train_loader)

        if prefetcher is not None:
            prefetcher.close()
        self.params, self.batch_stats, self.opt_state = \
            state.params, state.batch_stats, state.opt_state
        if self.opt.get("full_ckpt"):
            # the stage completed — drop the rolling mid-stage snapshot so a
            # later resume_full run can't rewind into a finished stage
            path = self._train_state_path(taski, step)
            if os.path.exists(path):
                os.remove(path)

    # ------------------------------------------------- full-state checkpoints
    # SURVEY §5 / VERDICT r2 #5: iteration-granular crash recovery.  The
    # rolling snapshot holds device state (params/batch_stats/opt_state incl.
    # the OneCycle counter) plus host state (jax PRNG key, numpy Generator,
    # memory_index, best_score).  Resume replays the deterministic task-start
    # path, restores the snapshot, and fast-forwards the data stream by
    # skipping index draws (DatasetManager.skip_batches) — giving a bitwise
    # continuation of the uninterrupted run (tests/test_full_ckpt.py).

    def _train_state_path(self, taski, step):
        return train_state_path(self.opt.get("output_dir", "./saved_models"),
                                self.opt.exp_name, self.opt.lan_list[taski],
                                taski, step)

    def _host_state(self, train_loader=None):
        host = {"np_rng": self.np_rng.bit_generator.state,
                "memory_index": [np.asarray(ix) for ix in self.memory_index],
                "best_score": self.best_score}
        if train_loader is not None and hasattr(train_loader,
                                                "rng_state_at_build"):
            host["manager_rng_at_build"] = train_loader.rng_state_at_build
        return host

    def _restore_host_state(self, host):
        self.np_rng.bit_generator.state = host["np_rng"]
        self.memory_index = [np.asarray(ix) for ix in host["memory_index"]]
        self.best_score = float(host["best_score"])

    def _rebuild_stream(self, train_loader, taski, step):
        """Re-run the loader-build call that preceded the crashed loop (with
        the manager generator restored to its at-build state, so shuffles
        replay bitwise).  Learners with other stream shapes override."""
        if taski == 0 or self.opt.memory is None:
            train_loader.get_dataset(taski, memory=None if taski == 0
                                     else self.opt.memory)
        else:
            train_loader.get_dataset(taski, memory=self.opt.memory,
                                     index_list=self.memory_index)

    def _restore_stream(self, train_loader, host, taski, step, iteration):
        """Restore the data stream to its consumed position at ``iteration``:
        rewind the manager generator to the at-build state, rebuild the
        loaders (reproducing construction-time shuffles), then skip the
        consumed index draws without materializing images."""
        if train_loader is None or not hasattr(train_loader, "skip_batches"):
            return
        if "manager_rng_at_build" in host and hasattr(train_loader, "rng"):
            train_loader.rng.bit_generator.state = host["manager_rng_at_build"]
            self._rebuild_stream(train_loader, taski, step)
        train_loader.skip_batches(iteration)

    def _save_full_state(self, taski, step, iteration, state,
                         train_loader=None):
        save_train_state(self._train_state_path(taski, step),
                         params=state.params, batch_stats=state.batch_stats,
                         opt_state=state.opt_state, iteration=iteration,
                         rng_key=self.rng,
                         host_state=self._host_state(train_loader))

    def _maybe_resume_full(self, start_iter, taski, step, train_loader):
        """If opt.resume_full is set and a rolling snapshot exists for this
        (task, step), restore it and fast-forward the data stream.  Returns
        the iteration to resume from (else ``start_iter`` unchanged)."""
        if not self.opt.get("resume_full"):
            return start_iter
        path = self._train_state_path(taski, step)
        if not os.path.exists(path):
            return start_iter
        payload = load_train_state(path, opt_state_template=self.opt_state)
        import flax.serialization
        self.params = flax.serialization.from_state_dict(self.params,
                                                         payload["params"])
        self.batch_stats = flax.serialization.from_state_dict(
            self.batch_stats, payload["batch_stats"])
        self.opt_state = payload["opt_state"]
        self.rng = jnp.asarray(payload["rng_key"])
        self._restore_host_state(payload["host_state"])
        iteration = payload["iteration"]
        self._restore_stream(train_loader, payload["host_state"], taski, step,
                             iteration)
        self.log.write(f"Task {taski} resume from {path} @ iter {iteration}.\n")
        return iteration

    def _init_train(self, start_iter, taski, train_loader, valid_loader):
        self._run_loop(start_iter, taski, train_loader, valid_loader)

    def _update_representation(self, start_iter, taski, train_loader, valid_loader):
        self._init_train(start_iter, taski, train_loader, valid_loader)

    # ------------------------------------------------------------ rehearsal

    def build_rehearsal_memory(self, train_loader, taski):
        """(reference: base.py:278-302)"""
        memory_num = self.opt.memory_num
        num_i = int(memory_num / taski)
        self.build_random_current_memory(num_i, taski, train_loader)
        if self.memory_index and len(self.memory_index) * len(self.memory_index[0]) > memory_num:
            self.reduce_samplers(taski, taski_num=num_i)
        train_loader.get_dataset(taski, memory=self.opt.memory,
                                 index_list=self.memory_index)

    def build_random_current_memory(self, taski_num, taski, train_loader):
        _, len_data = train_loader.rehearsal_prev_model(taski)
        index_list = self.np_rng.choice(range(len_data), taski_num, replace=False)
        self.memory_index.append(index_list)

    def reduce_samplers(self, taski, taski_num):
        for i in range(taski):
            self.memory_index[i] = self.memory_index[i][:taski_num]

    # ------------------------------------------------------------------- eval

    def _eval_logits(self, variables, images, text, val_choose):
        """Model forward for evaluation; learners override for dict-output
        models (DER 'logits') and routing modes (MRN FF/TF;
        reference: test.py:163-172, 192-201)."""
        if text is not None:
            out = self.model.apply(variables, images, text=text, train=False,
                                   is_train=False)
        else:
            out = self.model.apply(variables, images, train=False)
        return out["predict"] if "predict" in out else out["logits"]

    def make_eval_batch(self, val_choose: str = "val"):
        """Jitted eval closure for the current model.  Params are passed as
        arguments (not captured) so the compiled function stays valid as
        training updates them.  The closure is cached per (val_choose, model
        identity, routing phase) — a fresh ``@jax.jit`` object per call would
        recompile on every run_validation."""
        cache_key = (val_choose, getattr(self, "_phase", None))
        models = (self.model, getattr(self, "mrn_model", None))
        cache = self.__dict__.setdefault("_eval_fn_cache", {})
        entry = cache.get(cache_key)
        if entry is not None and all(a is b for a, b in zip(entry[0], models)):
            return entry[1]

        is_attn = self.opt.Prediction == "Attn"
        pad_id = self._pad_id()
        sos_id = getattr(self.converter, "sos_id", 0)

        # post-training w8a8 eval (evaluate_cli --int8): the quant collection
        # (calibrated act_amax + kernel scales, mrn_tpu.ops.int8) rides along
        eval_quant = getattr(self, "eval_quant", None)

        @jax.jit
        def eval_fn(params, batch_stats, images, labels_index, lengths):
            variables = {"params": params, "batch_stats": batch_stats}
            if eval_quant is not None:
                variables["quant"] = eval_quant
            if is_attn:
                text = jnp.full((images.shape[0], 1), sos_id, jnp.int32)
                logits = self._eval_logits(variables, images, text, val_choose)
                target = labels_index[:, 1:]
                lsum = cross_entropy_ignore(logits, target, pad_id) * jnp.sum(target != pad_id)
                lcount = jnp.sum(target != pad_id)
            else:
                logits = self._eval_logits(variables, images, None, val_choose)
                per = ctc_loss_per_sample(logits, labels_index, lengths)
                per = per / jnp.maximum(lengths, 1)
                valid = lengths > 0
                lsum = jnp.where(valid, jnp.where(jnp.isfinite(per), per, 0.0), 0.0).sum()
                lcount = valid.sum()
            probs = jax.nn.softmax(logits, axis=2)
            from mrn_tpu.parallel.mesh import gather_for_host
            return gather_for_host({
                "preds_index": jnp.argmax(logits, 2).astype(jnp.int32),
                "max_probs": jnp.max(probs, 2),
                "loss_sum": lsum,
                "loss_count": lcount,
            })

        def eval_batch(images, labels_index, lengths):
            return eval_fn(self.params, self.batch_stats,
                           self._device_images(images),
                           jnp.asarray(labels_index), jnp.asarray(lengths))

        cache[cache_key] = (models, eval_batch)
        return eval_batch

    def run_validation(self, valid_loader, val_choose: str = "val"):
        return validation(self.make_eval_batch(val_choose), valid_loader,
                          self.converter, self.opt,
                          is_attn=self.opt.Prediction == "Attn")

    def val(self, valid_loader, opt, best_score, start_time, iteration,
            train_loss_avg, taski, step=None, val_choose="val"):
        """(reference: base.py:304-361)"""
        res = self.run_validation(valid_loader, val_choose)
        if res.score > self.best_score:
            self.best_score = res.score
            self._save_best(taski, step=step)
        elapsed = time.time() - start_time
        line = (f"\n[{iteration}/{opt.num_iter}] Train_loss: {train_loss_avg.val():0.5f}, "
                f"Valid_loss: {res.loss:0.5f}\n"
                f"Current_score: {res.score:0.2f}, Ned_score: {res.ned or 0:0.2f}\n"
                f"Best_score: {self.best_score:0.2f}\n"
                f"Infer_time: {res.infer_time:0.2f}, Elapsed_time: {elapsed:0.2f}\n")
        for gt, pred, conf in zip(res.labels[:5], res.preds[:5], res.confidences[:5]):
            line += f"{gt:25s} | {pred:25s} | {conf:0.4f}\t{pred == gt}\n"
        self.log.write(line)
        return res

    # --------------------------------------------------------- checkpointing

    def _ckpt_step_tag(self):
        return None  # MRN overrides with its 2-step tag

    def _save_best(self, taski, step=None):
        path = best_model_path(self.opt.get("output_dir", "./saved_models"),
                               self.opt.exp_name, self.opt.lan_list[taski],
                               taski, step)
        save_model(path, self.params, self.batch_stats)

    def _load_best(self, taski, step=None):
        path = best_model_path(self.opt.get("output_dir", "./saved_models"),
                               self.opt.exp_name, self.opt.lan_list[taski],
                               taski, step)
        payload = load_model(path, {"params": self.params,
                                    "batch_stats": self.batch_stats})
        self.params = payload["params"]
        self.batch_stats = payload["batch_stats"]
        self.log.write(f"Task {taski} load checkpoint from {path}.\n")

    def _after_resume(self, taski, train_loader):
        """Hook after a start_task checkpoint replay: rebuild learner state
        the skipped _train would have produced.  Base has none; EWC
        recomputes its Fisher here (the reference loses it on resume)."""

    # -------------------------------------------------------------- task end

    def after_task(self):
        """Snapshot the old network (base.py:151-154)."""
        self._old_params = jax.tree_util.tree_map(jnp.array, self.params)
        self._old_batch_stats = jax.tree_util.tree_map(jnp.array, self.batch_stats)
        self._known_classes = self._total_classes

    def test(self, valid_datas, best_scores, ned_scores, taski,
             val_dataset_builder=None, val_choose="test"):
        """Evaluate all seen tasks; MLT17/19 interleaved split averaging
        (reference: base.py:363-436)."""
        self._load_best(taski, step=self._ckpt_step_tag())
        task_accs, ned_accs = [], []
        for val_data in valid_datas:
            loader = val_dataset_builder(val_data)
            res = self.run_validation(loader, val_choose)
            task_accs.append(round(res.score, 2))
            ned_accs.append(round(res.ned if res.ned is not None else 0.0, 2))

        self.log.write_data_log(f"----------- {self.opt.exp_name} Task {taski}------------\n")
        if (taski + 1) * 2 == len(task_accs):
            score17, score19 = self.double_write(taski, task_accs)
            best_scores.append(score17)
            ned_scores.append(score19)
            self.log.write(f"Task {taski} Avg Incremental Acc: 17: {score17} 19: {score19}\n")
        else:
            best_scores.append(round(sum(task_accs) / len(task_accs), 2))
            ned_scores.append(round(sum(ned_accs) / len(ned_accs), 2))
            # [-1] == the just-appended stage mean ([taski] in the normal
            # flow, but robust when earlier stages' evals were skipped on a
            # checkpoint resume)
            self.log.write(f"Task {taski} Test AIA: {best_scores[-1]}\n"
                           f"Task {taski} accs: {task_accs}\nned: {ned_accs}\n")
            self.log.write_data_log(
                f"{taski} Avg Acc: {best_scores[-1]:0.2f} \n  acc: {task_accs}\n")
        return best_scores, ned_scores

    def double_write(self, taski, accs):
        """Interleaved MLT17/MLT19 averaging (base.py:425-436)."""
        list17 = [accs[i * 2] for i in range(taski + 1)]
        list19 = [accs[i * 2 + 1] for i in range(taski + 1)]
        score17 = round(sum(list17) / len(list17), 2)
        score19 = round(sum(list19) / len(list19), 2)
        self.log.write_data_log(
            f"Task{taski} : 2017: {score17:0.2f} 2019: {score19:0.2f}\n"
            f"17 acc: {list17}\n19 acc: {list19}\n")
        return score17, score19

    def count_param(self):
        n = count_params(self.params)
        self.log.write(f"Total parameters: {n / 1e6:0.2f} M\n")
        return n
