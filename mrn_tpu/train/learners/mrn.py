"""MRN learner — Multiplexed Routing Network (the paper's method;
reference: il_modules/mrn.py:32-518).

Two phases per task i > 0 (mrn.py:165-167):
- step 0: train the NEW expert alone (cross=False) on current-task data —
  functionally the base loop on a standalone Recognizer — then freeze it
  (update_step1, mrn.py:281-287);
- step 1: rebuild the router stack, stack ALL experts (vmapped ensemble,
  models/mrn.py), and train the router only for num_iter/2 iterations on the
  rehearsal-mixed stream whose batches carry the memory(0)/current(1) index;
  loss = 15 * CTC/CE + CE(router_scores, index) (mrn.py:298-384), validation
  in 'TF' hard-routing mode every val_interval/5.

State layout: per-expert param/stat trees at their creation-time class counts
(the stacked tree pads them to the current class space on the fly), plus the
current task's router params.  Checkpoints serialize the whole composite.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.models.composer import build_recognizer
from mrn_tpu.models.mrn import (MRNNet, stack_expert_params,
                                unstack_expert_stats)
from mrn_tpu.models.surgery import apply_reference_init
from mrn_tpu.ops.losses import cross_entropy_dense
from mrn_tpu.train.checkpoint import (best_model_path, deep_merge, load_model,
                                      load_train_state, prune_named_subtrees,
                                      save_model, save_train_state)
from mrn_tpu.train.learners.base import BaseLearner
from mrn_tpu.train.steps import recognition_loss

PI = 15.0  # recognition-loss weight in the router phase (mrn.py:298,360)


class MRN(BaseLearner):

    def __init__(self, opt):
        super().__init__(opt)
        self.expert_params: List = []
        self.expert_stats: List = []
        self.class_counts: List[int] = []
        self.router_params = None
        self.mrn_model = None   # MRNNet module for the current task
        self._phase = "standalone"  # "standalone" | "routed"
        self._expert_hashes: List = []  # content hashes, aligned w/ experts

    # ------------------------------------------------------------- model mgmt

    def build_model(self):
        """Task 0: first expert with the reference kaiming pass (mrn.py:110-134)."""
        self.model = build_recognizer(self.opt, self._total_classes)
        variables = self._init_variables(self.model)
        self.params = apply_reference_init(variables["params"], self._next_rng())
        self.batch_stats = variables.get("batch_stats", {})
        self._phase = "standalone"
        self._build_mrn_module(n_experts=1)

    def change_model(self):
        """Task i>0: append a fresh expert (torch-default init, mrn.py:96-108)
        and rebuild the router stack."""
        self.model = build_recognizer(self.opt, self._total_classes)
        variables = self._init_variables(self.model)
        self.params = variables["params"]          # the NEW expert (random)
        self.batch_stats = variables.get("batch_stats", {})
        self._phase = "standalone"
        self._build_mrn_module(n_experts=len(self.expert_params) + 1)
        self.opt_state = None

    def _build_mrn_module(self, n_experts, counts=None):
        opt = self.opt
        if counts is None:
            # during training the newest expert is still outside the list
            counts = tuple(self.class_counts + [self._total_classes])
        self.mrn_model = MRNNet(
            n_experts=n_experts, num_classes=self._total_classes,
            class_counts=counts, prediction=opt.Prediction,
            transformation=opt.Transformation,
            feature_extraction=opt.FeatureExtraction,
            sequence_modeling=opt.SequenceModeling,
            output_channel=opt.output_channel, hidden_size=opt.hidden_size,
            num_fiducial=opt.num_fiducial, img_size=(opt.imgH, opt.imgW),
            batch_max_length=opt.batch_max_length)

    def _init_router_params(self):
        """Fresh router stack per task (model.py:437-452): init the MRNNet and
        keep only the router subtrees."""
        image, text = self._dummy_batch()
        kwargs = {"text": text[:, :-1]} if text is not None else {}
        variables = self.mrn_model.init(
            {"params": self._next_rng(), "droppath": self._next_rng()},
            image, train=False, is_train=True, **kwargs)
        params = dict(variables["params"])
        return {k: params[k] for k in ("dm_router", "channel_route", "route")}

    def _routed_variables(self, router_params):
        """Assemble the full MRNNet variable tree from the frozen expert list
        (step 0 already absorbed the newest expert via _freeze_newest).
        With an expert-parallel mesh installed (set_expert_parallel /
        opt.expert_parallel), the stacked expert axis is sharded over the
        'expert' mesh axis — the TPU-native scale-out for the ensemble."""
        from mrn_tpu.parallel.mesh import shard_experts

        n = len(self.expert_params)
        stacked_params = shard_experts(
            stack_expert_params(self.expert_params, self._total_classes,
                                self.opt.Prediction), n)
        stacked_stats = shard_experts(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *self.expert_stats), n) \
            if self.expert_stats[0] else {}
        params = dict(router_params)
        params["experts"] = stacked_params
        return params, ({"experts": stacked_stats}
                        if self.expert_stats[0] else {})

    # ------------------------------------------------------------------ train

    def incremental_train(self, taski, character, train_loader, valid_loader):
        """(reference: mrn.py:136-167)"""
        self._cur_task = taski
        self.character = character
        self.converter = self.build_converter()
        if taski > 0:
            self.change_model()
        else:
            self.build_model()
        self.count_param()
        self.build_optimizer()

        self._train_mrn(0, taski, train_loader, valid_loader, step=0)
        if taski > 0:
            self._train_mrn(0, taski, train_loader, valid_loader, step=1)

    def _train_mrn(self, start_iter, taski, train_loader, valid_loader, step):
        """(reference: mrn.py:185-223)"""
        resume = self.opt.start_task > taski + step * 0.5
        if resume:
            if taski > 0 and step == 0:
                train_loader.get_dataset(taski, memory=None)
            elif taski > 0 and step == 1:
                if self.opt.memory is not None:
                    self.build_rehearsal_memory(train_loader, taski)
                else:
                    train_loader.get_dataset(taski, memory=self.opt.memory)
            self._load_best(taski, step=step)
            if step == 0 and taski > 0:
                self._freeze_newest()
            return

        if taski == 0:
            self._run_loop(start_iter, taski, train_loader,
                           valid_loader.create_dataset(), step=0)
        elif step == 0:
            train_loader.get_dataset(taski, memory=None)
            self._run_loop(start_iter, taski, train_loader,
                           valid_loader.create_dataset(), step=0)
            self._freeze_newest()
        else:
            if self.opt.memory is not None:
                self.build_rehearsal_memory(train_loader, taski)
            else:
                train_loader.get_dataset(taski, memory=self.opt.memory)
            self._update_router(start_iter, taski, train_loader,
                                valid_loader.create_list_dataset())

    def _freeze_newest(self):
        """update_step1 tail: freeze + eval the newest expert (mrn.py:285-287).
        The expert list absorbs the current standalone params; the frozen
        expert is written once as a content-addressed blob so later best-score
        checkpoints reference it instead of re-serializing it (the reference
        re-saves the whole MRNNet on every new best, mrn.py:411-415 — at 6
        experts that's ~50MB per save over the slow host link)."""
        self.expert_params.append(self.params)
        self.expert_stats.append(self.batch_stats)
        self.class_counts.append(self._total_classes)
        self._expert_hashes.append(None)
        self._ensure_expert_blobs()

    # ---- step-1: router training over the stacked ensemble -----------------

    def build_rehearsal_memory(self, train_loader, taski):
        """MRN variant (mrn.py:170-182): memory_num >= 5000 keeps full-size
        per-task memories."""
        memory_num = self.opt.memory_num
        num_i = memory_num if memory_num >= 5000 else int(memory_num / taski)
        self.build_random_current_memory(num_i, taski, train_loader)
        if memory_num < 5000:
            if self.memory_index and len(self.memory_index) * len(self.memory_index[0]) > memory_num:
                self.reduce_samplers(taski, taski_num=num_i)
        train_loader.get_dataset(taski, memory=self.opt.memory,
                                 index_list=self.memory_index)

    def _update_router(self, start_iter, taski, train_loader, valid_loader):
        """(reference: mrn.py:298-384)"""
        self._phase = "routed"
        fresh_router = self._init_router_params()
        params, stats = self._routed_variables(fresh_router)
        self.params = params
        self.batch_stats = stats
        self.build_optimizer(scale=1.0, the=2)

        n_iter = int(self.opt.num_iter // 2)
        self._run_loop(start_iter, taski, train_loader, valid_loader,
                       num_iter=n_iter, get_batch=train_loader.get_batch2,
                       step=1, val_interval=max(1, self.opt.val_interval // 5))

        # write back drifted expert batch stats; keep router params.  In the
        # default pinned mode nothing mutates, so skip the write-back (and
        # keep the content hashes valid); quirk mode invalidates the hashes
        # so the next best-save re-blobs the drifted experts.
        if self.batch_stats and not self.opt.get("mrn_pin_expert_stats", True):
            per_expert = unstack_expert_stats(self.batch_stats["experts"],
                                              len(self.expert_params))
            self.expert_stats = per_expert
            self._expert_hashes = [None] * len(self.expert_params)
        self.router_params = {k: self.params[k]
                              for k in ("dm_router", "channel_route", "route")}

    def trainable_mask(self):
        if self._phase == "routed":
            return jax.tree_util.tree_map(lambda _: True, self.params) | {
                "experts": jax.tree_util.tree_map(lambda _: False,
                                                  self.params["experts"])}
        return super().trainable_mask()

    def _apply_routed_train(self, params, batch_stats, batch, rng):
        kwargs = {}
        if self.opt.Prediction == "Attn":
            kwargs["text"] = batch["label"][:, :-1]
        if self.opt.get("mrn_pin_expert_stats", True):
            # EVERY expert is frozen during router training (even the newest:
            # update_step1 freezes+evals it, mrn.py:281-287), so the ensemble
            # runs in inference mode: BN normalizes with each expert's own
            # frozen running stats and nothing is mutated.  The reference
            # instead drifts — its val() flips the whole net back to .train()
            # after the iteration-1 validation (il_modules/mrn.py:401), so
            # frozen experts' running stats slide toward the mixed rehearsal
            # stream for the rest of the router phase.  On distribution-
            # disjoint tasks that collapses final-stage accuracy (measured:
            # stage-5 Bangla 11.4% with 83% correct routing, vs ~100% under
            # pristine stats — scripts/router_diagnose2.py).  is_train=True
            # keeps the soft routing combination (cross_forward semantics).
            out = self.mrn_model.apply(
                {"params": self._mp_cast(params), "batch_stats": batch_stats},
                self._mp_cast(batch["image"]),
                cross=True, train=False, is_train=True, **kwargs)
            return self._mp_f32(out), batch_stats
        # reference-quirk mode: experts run in train mode, stats drift
        out, mutated = self.mrn_model.apply(
            {"params": self._mp_cast(params),
             "batch_stats": batch_stats},  # f32 EMA base (see base.py)
            self._mp_cast(batch["image"]),
            cross=True, train=True, is_train=True,
            mutable=["batch_stats"], rngs={"droppath": rng}, **kwargs)
        return self._mp_f32(out), self._mp_f32(mutated["batch_stats"])

    def loss_fn(self, params, batch_stats, batch, rng, aux):
        rec = recognition_loss(self.opt.Prediction, self._pad_id())
        if self._phase != "routed":
            preds, new_stats = self._apply_train(params, batch_stats, batch, rng)
            return rec(preds, batch), (new_stats, {})
        # ALL experts are frozen during router training (reference freezes
        # them via requires_grad=False, mrn.py:154-157, 285-287 — torch never
        # differentiates through them).  stop_gradient is the exact JAX
        # equivalent: backward skips the whole expert ensemble, so no expert
        # activations are saved (at task 5 that's ~7GB of VGG residuals at
        # batch 256) and the router update is unchanged (the optimizer mask
        # already zeroed expert updates).
        params = dict(params)
        params["experts"] = jax.tree_util.tree_map(
            jax.lax.stop_gradient, params["experts"])
        out, new_stats = self._apply_routed_train(params, batch_stats, batch, rng)
        loss_clf = rec(out["logits"], batch)
        # CE applied ON the softmaxed routing weights, exactly like the
        # reference (taski_criterion(output['index'], indexs), mrn.py:342/360)
        taski_loss = cross_entropy_dense(out["index"], batch["dataset_idx"])
        loss = PI * loss_clf + taski_loss
        return loss, (new_stats, {"clf": loss_clf, "router": taski_loss,
                                  "log_loss": loss_clf})

    # ------------------------------------------------------------------- eval

    def _eval_logits(self, variables, images, text, val_choose):
        if val_choose in ("FF", "val") and self._phase == "standalone":
            if text is not None:
                out = self.model.apply(variables, images, text=text,
                                       train=False, is_train=False)
            else:
                out = self.model.apply(variables, images, train=False)
            return out["predict"]
        # TF: hard-argmax expert pick (cross_forward_expert)
        kwargs = {"text": text} if text is not None else {}
        out = self.mrn_model.apply(variables, images, cross=True, train=False,
                                   is_train=False, **kwargs)
        return out["logits"]

    def val(self, valid_loader, opt, best_score, start_time, iteration,
            train_loss_avg, taski, step=None, val_choose=None):
        if val_choose is None:
            val_choose = "FF" if self._phase == "standalone" else "TF"
        return super().val(valid_loader, opt, best_score, start_time, iteration,
                           train_loss_avg, taski, step=step if step is not None
                           else (0 if self._phase == "standalone" else 1),
                           val_choose=val_choose)

    def _ckpt_step_tag(self):
        return 0 if self._cur_task == 0 else 1

    # ----------------------------------------------- full-state checkpoints
    # Router-phase snapshots persist only what replay can't reconstruct: the
    # router subtrees, the optimizer state minus the frozen experts' (zeroed)
    # Adam moments, and — in reference-quirk mode — the drifting expert batch
    # stats.  The frozen expert stack itself (~200MB at stage 5, plus 2x that
    # in Adam moments) is reassembled from the expert list on resume, so a
    # rolling snapshot costs ~1MB instead of ~600MB over the slow tunnel.

    _ROUTER_KEYS = ("dm_router", "channel_route", "route")

    def _rebuild_stream(self, train_loader, taski, step):
        if step == 0 or taski == 0:
            train_loader.get_dataset(taski, memory=None)
        else:
            train_loader.get_dataset(taski, memory=self.opt.memory,
                                     index_list=self.memory_index)

    def _save_full_state(self, taski, step, iteration, state,
                         train_loader=None):
        if self._phase != "routed":
            return super()._save_full_state(taski, step, iteration, state,
                                            train_loader)
        import flax.serialization
        params = {k: v for k, v in state.params.items() if k != "experts"}
        pinned = self.opt.get("mrn_pin_expert_stats", True)
        stats = {} if pinned else state.batch_stats
        opt_sd = prune_named_subtrees(
            flax.serialization.to_state_dict(state.opt_state), "experts")
        save_train_state(self._train_state_path(taski, step),
                         params=params, batch_stats=stats, opt_state=opt_sd,
                         iteration=iteration, rng_key=self.rng,
                         host_state=self._host_state(train_loader))

    def _maybe_resume_full(self, start_iter, taski, step, train_loader):
        if self._phase != "routed":
            return super()._maybe_resume_full(start_iter, taski, step,
                                              train_loader)
        if not self.opt.get("resume_full"):
            return start_iter
        path = self._train_state_path(taski, step)
        if not os.path.exists(path):
            return start_iter
        import flax.serialization
        payload = load_train_state(path)
        # router params overlay the freshly assembled composite tree
        params = dict(self.params)
        for k in self._ROUTER_KEYS:
            params[k] = flax.serialization.from_state_dict(self.params[k],
                                                           payload["params"][k])
        self.params = params
        if payload["batch_stats"]:  # quirk mode: drifted expert stats persist
            self.batch_stats = flax.serialization.from_state_dict(
                self.batch_stats, payload["batch_stats"])
        opt_sd = flax.serialization.to_state_dict(self.opt_state)
        deep_merge(opt_sd, payload["opt_state"])
        self.opt_state = flax.serialization.from_state_dict(self.opt_state,
                                                            opt_sd)
        self.rng = jnp.asarray(payload["rng_key"])
        self._restore_host_state(payload["host_state"])
        iteration = payload["iteration"]
        self._restore_stream(train_loader, payload["host_state"], taski, step,
                             iteration)
        self.log.write(f"Task {taski} resume router from {path} "
                       f"@ iter {iteration}.\n")
        return iteration

    # --------------------------------------------------------- checkpointing
    # The reference re-serializes the whole MRNNet state dict on every new
    # best (mrn.py:411-415).  Here frozen experts are content-addressed blobs
    # under {exp_name}/experts/, written once when frozen; best-score
    # checkpoints store only the live params (router, in the routed phase),
    # the stats and the blob references — ~6x less checkpoint traffic at
    # stage 5.  _load_best accepts both this layout and the legacy inline
    # 'experts' list (pre-round-3 checkpoints).

    def _expert_dir(self):
        return os.path.join(self.opt.get("output_dir", "./saved_models"),
                            self.opt.exp_name, "experts")

    @staticmethod
    def _tree_hash(*trees):
        import flax.serialization
        h = hashlib.sha1()

        def walk(x):
            if isinstance(x, dict):
                for k in sorted(x):
                    h.update(str(k).encode())
                    walk(x[k])
            else:
                arr = np.asarray(x)
                h.update(str(arr.dtype).encode())
                h.update(str(arr.shape).encode())
                h.update(arr.tobytes())

        for t in trees:
            walk(flax.serialization.to_state_dict(jax.device_get(t)))
        return h.hexdigest()[:16]

    def _ensure_expert_blobs(self):
        """Write a blob for every expert lacking one; returns the ref list."""
        for i, (p, s) in enumerate(zip(self.expert_params, self.expert_stats)):
            if i < len(self._expert_hashes) and self._expert_hashes[i]:
                continue
            ref = self._tree_hash(p, s)
            path = os.path.join(self._expert_dir(), f"{ref}.msgpack")
            if not os.path.exists(path):
                save_model(path, p, s,
                           extra={"class_count": self.class_counts[i]
                                  if i < len(self.class_counts) else 0})
            while len(self._expert_hashes) <= i:
                self._expert_hashes.append(None)
            self._expert_hashes[i] = ref
        return list(self._expert_hashes[:len(self.expert_params)])

    def _save_best(self, taski, step=None):
        path = best_model_path(self.opt.get("output_dir", "./saved_models"),
                               self.opt.exp_name, self.opt.lan_list[taski],
                               taski, step)
        router = self.router_params or {}
        if isinstance(self.params, dict) and "dm_router" in self.params:
            router = {k: self.params[k]
                      for k in ("dm_router", "channel_route", "route")}
        refs = self._ensure_expert_blobs()
        params = self.params
        stats = self.batch_stats
        if isinstance(params, dict) and "experts" in params:
            # routed phase: the stacked expert axis is reconstructable from
            # the blobs — persist only the router subtrees
            params = {k: v for k, v in params.items() if k != "experts"}
            if isinstance(stats, dict) and "experts" in stats:
                stats = {k: v for k, v in stats.items() if k != "experts"}
        save_model(path, params, stats,
                   extra={"expert_refs": refs,
                          "expert_stats": list(self.expert_stats),
                          "router": router})

    def restore_composite(self, payload, expert_dir=None):
        """Restore the composite expert state from a best-score payload —
        both the blob-referencing layout (``expert_refs`` resolved under
        ``expert_dir``, default this learner's experts/ dir) and the legacy
        inline ``experts`` list.  Shared by _load_best and evaluate_cli."""
        self.params = payload["params"]
        self.batch_stats = payload["batch_stats"]
        if payload.get("expert_refs"):
            refs = [r.decode() if isinstance(r, bytes) else str(r)
                    for r in payload["expert_refs"]]
            self.expert_params, self.expert_stats = [], []
            for ref in refs:
                blob = load_model(os.path.join(expert_dir or self._expert_dir(),
                                               f"{ref}.msgpack"))
                self.expert_params.append(blob["params"])
                self.expert_stats.append(blob["batch_stats"])
            self._expert_hashes = refs
            # quirk mode: drifted stats in the payload supersede blob stats
            if payload.get("expert_stats"):
                self.expert_stats = list(payload["expert_stats"])
        else:  # legacy inline layout (pre-round-3 checkpoints)
            self.expert_params = list(payload.get("experts", []))
            self.expert_stats = list(payload.get("expert_stats", []))
            self._expert_hashes = [None] * len(self.expert_params)
        self.router_params = payload.get("router") or None

    def _load_best(self, taski, step=None):
        path = best_model_path(self.opt.get("output_dir", "./saved_models"),
                               self.opt.exp_name, self.opt.lan_list[taski],
                               taski, step)
        self.restore_composite(load_model(path))
        self.log.write(f"Task {taski} load checkpoint from {path}.\n")

    def test(self, valid_datas, best_scores, ned_scores, taski,
             val_dataset_builder=None, val_choose=None):
        """(reference: mrn.py:448-515): task 0 -> FF/step 0; else TF/step 1."""
        if taski == 0:
            self._phase = "standalone"
            choose = "FF"
        else:
            self._phase = "routed"
            choose = "TF"
        return super().test(valid_datas, best_scores, ned_scores, taski,
                            val_dataset_builder=val_dataset_builder,
                            val_choose=choose)

    def run_validation(self, valid_loader, val_choose="val"):
        """In routed phase the eval variables are the assembled MRNNet tree."""
        if self._phase == "routed" and val_choose in ("TF", "test", "val"):
            params, stats = self._routed_params_for_eval()
            saved = (self.params, self.batch_stats)
            try:
                self.params, self.batch_stats = params, stats
                return super().run_validation(valid_loader, "TF")
            finally:
                self.params, self.batch_stats = saved
        return super().run_validation(valid_loader, val_choose)

    def _routed_params_for_eval(self):
        if isinstance(self.params, dict) and "experts" in self.params:
            return self.params, self.batch_stats
        return self._routed_variables(self.router_params)

    def after_task(self):
        """(reference: mrn.py:38-43).  At task 0 the (checkpoint-reloaded)
        first expert enters the frozen expert list — the analogue of the
        reference's expert living inside MRNNet.model from build_fc on."""
        if self._cur_task == 0 and not self.expert_params:
            self._freeze_newest()
        self._known_classes = self._total_classes
