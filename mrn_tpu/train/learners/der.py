"""DER learner — Dynamically Expandable Representation
(reference: il_modules/der.py:28-348):

per task, append a new extractor initialized from the previous one
(model.py:256-261), freeze all old extractors (der.py:101-104), train on
rehearsal-mixed data with the main classification loss (the aux loss is
computed but EXCLUDED from the total, der.py:264-265), then weight-align
(der.py:148; superseded by the checkpoint reload in test(), like the
reference).

TPU design: extractors run as one vmapped stack; freezing old ones is a
grad_transform zeroing their slices of the stacked leaves (leaf-level masks
can't reach inside a stacked axis)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.models.der import DERNet, extractor_stack
from mrn_tpu.models.surgery import (apply_reference_init, grow_fc, grow_fc_der,
                                    weight_align)
from mrn_tpu.train.learners.base import BaseLearner
from mrn_tpu.train.steps import recognition_loss


class DER(BaseLearner):

    def __init__(self, opt):
        super().__init__(opt)
        self.n_experts = 0

    # ------------------------------------------------------------- model mgmt

    def _build_dernet(self, n_experts):
        opt = self.opt
        return DERNet(
            n_experts=n_experts, num_classes=self._total_classes,
            prediction=opt.Prediction, transformation=opt.Transformation,
            feature_extraction=opt.FeatureExtraction,
            sequence_modeling=opt.SequenceModeling,
            output_channel=opt.output_channel, hidden_size=opt.hidden_size,
            num_fiducial=opt.num_fiducial, img_size=(opt.imgH, opt.imgW),
            batch_max_length=opt.batch_max_length)

    def build_model(self):
        self.n_experts = 1
        self.model = self._build_dernet(1)
        variables = self._init_variables(self.model)
        self.params = apply_reference_init(variables["params"], self._next_rng(),
                                           stacked=("extractors",))
        self.batch_stats = variables.get("batch_stats", {})

    def change_model(self):
        old_params, old_stats = self.params, self.batch_stats
        self.n_experts += 1
        self.model = self._build_dernet(self.n_experts)
        variables = self._init_variables(self.model)
        new_params = dict(variables["params"])
        new_stats = dict(variables.get("batch_stats", {}))

        # new extractor = copy of the previous one (model.py:256-261)
        old_stack = old_params["extractors"]
        new_params["extractors"] = jax.tree_util.tree_map(
            lambda o, n: jnp.concatenate([o, o[-1:]], axis=0),
            old_stack, new_params["extractors"])
        if "extractors" in old_stats:
            new_stats["extractors"] = jax.tree_util.tree_map(
                lambda o, n: jnp.concatenate([o, o[-1:]], axis=0),
                old_stats["extractors"], new_stats["extractors"])

        # fc growth: CTC fc input grew by out_dim; Attn fc input is fixed
        # (model.py:263-278)
        if self.opt.Prediction == "CTC":
            new_params = grow_fc_der(new_params, old_params,
                                     out_dim=self.opt.hidden_size)
        else:
            new_params = grow_fc(new_params, old_params)
        # aux head + decoder stay freshly initialized (reference recreates them)
        self.params = new_params
        self.batch_stats = new_stats
        self.opt_state = None

    def grad_transform(self):
        """Zero grads of frozen (non-newest) extractor slices (der.py:101-104)."""
        if self.n_experts <= 1:
            return None
        n = self.n_experts

        def mask(grads):
            def zero_old(g):
                keep = jnp.arange(n) == n - 1  # only the newest trains
                shape = (n,) + (1,) * (g.ndim - 1)
                return g * keep.reshape(shape).astype(g.dtype)
            grads = dict(grads)
            grads["extractors"] = jax.tree_util.tree_map(zero_old,
                                                         grads["extractors"])
            return grads

        return mask

    # ------------------------------------------------------------------ train

    def _stack_module(self, k: int):
        opt = self.opt
        return extractor_stack(
            k, opt.Transformation, opt.FeatureExtraction, opt.SequenceModeling,
            opt.output_channel, opt.hidden_size, opt.num_fiducial,
            (opt.imgH, opt.imgW))

    def _apply_train(self, params, batch_stats, batch, rng):
        kwargs = {}
        if self.opt.Prediction == "Attn":
            kwargs["text"] = batch["label"][:, :-1]
        p = self._mp_cast(params)
        image = self._mp_cast(batch["image"])
        if self.n_experts <= 1:
            out, mutated = self.model.apply(
                {"params": p, "batch_stats": batch_stats},  # f32 EMA base
                image, train=True, mutable=["batch_stats"],
                rngs={"droppath": rng}, **kwargs)
            return self._mp_f32(out), self._mp_f32(mutated["batch_stats"])

        # reference model_eval_and_train (il_modules/der.py:38-43): frozen
        # old extractors forward in EVAL mode — their running stats feed the
        # fc and never drift toward the rehearsal-mixed stream (the same BN
        # bug class as MRN's stage-5 collapse). Only the newest expert runs
        # in train mode and updates its stats.
        n = self.n_experts
        sl = lambda tree, s: jax.tree_util.tree_map(lambda x: x[s], tree)
        feats_frozen = self._stack_module(n - 1).apply(
            {"params": sl(p["extractors"], slice(0, n - 1)),
             "batch_stats": sl(batch_stats["extractors"], slice(0, n - 1))},
            image, False)
        feats_frozen = jax.lax.stop_gradient(feats_frozen)
        feats_live, mut = self._stack_module(1).apply(
            {"params": sl(p["extractors"], slice(n - 1, n)),
             "batch_stats": sl(batch_stats["extractors"], slice(n - 1, n))},
            image, True, mutable=["batch_stats"], rngs={"droppath": rng})
        feats = jnp.concatenate([feats_frozen, feats_live], axis=0)
        out = self.model.apply(
            {"params": p, "batch_stats": batch_stats}, feats,
            is_train=True, method="heads", rngs={"droppath": rng}, **kwargs)

        live_stats = self._mp_f32(mut["batch_stats"])
        new_stats = dict(batch_stats)
        new_stats["extractors"] = jax.tree_util.tree_map(
            lambda full, new1: jnp.concatenate(
                [full[:n - 1], new1.astype(full.dtype)], axis=0),
            batch_stats["extractors"], live_stats)
        return self._mp_f32(out), new_stats

    def loss_fn(self, params, batch_stats, batch, rng, aux):
        rec = recognition_loss(self.opt.Prediction, self._pad_id())
        out, new_stats = self._apply_train(params, batch_stats, batch, rng)
        loss_clf = rec(out["logits"], batch)
        # aux loss computed for logging but EXCLUDED from total (der.py:264-265)
        loss_aux = rec(out["aux_logits"], batch)
        loss = loss_clf
        return loss, (new_stats, {"clf": loss_clf,
                                  "aux": jax.lax.stop_gradient(loss_aux)})

    def _update_representation(self, start_iter, taski, train_loader, valid_loader):
        super()._update_representation(start_iter, taski, train_loader, valid_loader)
        # end-of-task align (der.py:148); superseded by the ckpt reload in test()
        self.params, gamma = weight_align(
            self.params, self._total_classes - self._known_classes)
        self.log.write(f"alignweights,gamma={gamma}\n")

    def after_task(self):
        self._known_classes = self._total_classes
