"""MRNNet: stacked per-task expert recognizers + DM-Router
(reference: modules/model.py MRNNet 314-497, il_modules/mrn.py).

TPU-first redesign of the reference's Python expert loop
(``[convnet(image) for convnet in self.model]``, model.py:368/399): expert
parameters are STACKED on a leading axis and the whole ensemble runs as ONE
vmapped forward — a batched routed einsum on the MXU instead of I sequential
module calls.

Parity notes (load-bearing quirks preserved):
- old experts' logits are padded to the current class count WITH ONES, not
  zeros (pad_zeros_features uses torch.ones, model.py:361-364) — realized here
  as a post-hoc mask over the stacked [I,B,T,C_total] logits;
- training combines experts by softmax(beta * route_scores) and the returned
  'index' IS that softmax (model.py:406, 495-496) — the router CE is applied
  on top of it by the learner, exactly like the reference;
- eval ('TF') picks one expert per sample by hard argmax of the scores
  (cross_forward_expert, model.py:366-395);
- the router stack (route / channel_route / dm_router) is rebuilt from scratch
  at every task (model.py:437-452).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrn_tpu.models.common import TorchDense
from mrn_tpu.models.composer import Recognizer, sequence_length
from mrn_tpu.models.router import DMRouter

__all__ = ["MRNNet", "stack_expert_params", "unstack_expert_stats",
           "pad_expert_tree"]


class MRNNet(nn.Module):
    """Routed ensemble.  Expert params/stats are stacked on axis 0 under the
    'experts' collection entry; class_counts[i] is expert i's true vocabulary
    size within the padded num_classes space."""

    n_experts: int
    num_classes: int                  # C_total of the current task
    class_counts: tuple               # per-expert true class counts
    prediction: str = "CTC"
    transformation: str = "None"
    feature_extraction: str = "VGG"
    sequence_modeling: str = "BiLSTM"
    output_channel: int = 512
    hidden_size: int = 256
    num_fiducial: int = 20
    img_size: tuple = (32, 256)
    batch_max_length: int = 25
    beta: float = 1.0

    def setup(self):
        expert_cls = nn.vmap(
            Recognizer,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "droppath": True},
            in_axes=(None, None, None, None, 0),
            out_axes=0,
            axis_size=self.n_experts,
        )
        self.experts = expert_cls(
            num_classes=self.num_classes,
            prediction=self.prediction,
            transformation=self.transformation,
            feature_extraction=self.feature_extraction,
            sequence_modeling=self.sequence_modeling,
            output_channel=self.output_channel,
            hidden_size=self.hidden_size,
            num_fiducial=self.num_fiducial,
            img_size=self.img_size,
            batch_max_length=self.batch_max_length,
            name="experts",
        )
        patch = sequence_length(self.feature_extraction, self.img_size[1])
        self.patch = patch
        # router stack, rebuilt each task (model.py:437-452)
        self.dm_router = DMRouter(self.hidden_size, self.hidden_size * 2,
                                  patch, self.n_experts, name="dm_router")
        self.channel_route = TorchDense(self.n_experts, name="channel_route")
        self.route = TorchDense(1, name="route")

    def _expert_forward(self, image, text, train, is_train):
        counts = jnp.asarray(self.class_counts, jnp.int32)
        out = self.experts(image, text, train, is_train, counts)
        return out["predict"], out["feature"]  # [I,B,T,C], [I,B,T,H]

    def _route_scores(self, features):
        """features [I,B,T,H] -> scores [B,I] (model.py:397-405)."""
        route_info = jnp.transpose(features, (1, 0, 2, 3))   # [B,I,T,H]
        route_info = self.dm_router(route_info)              # [B,I,T,H]
        b = route_info.shape[0]
        # rearrange 'b h w c -> b w (h c)'
        route_info = jnp.transpose(route_info, (0, 2, 1, 3)).reshape(
            b, self.patch, self.n_experts * self.hidden_size)
        route_info = self.channel_route(route_info)          # [B,T,I]
        route_info = jnp.swapaxes(route_info, 1, 2)          # [B,I,T]
        scores = self.route(route_info)[..., 0]              # [B,I]
        return scores

    def _ones_pad(self, logits):
        """Apply the reference's ones-padding to stacked expert logits:
        logits[i, ..., c] for c >= class_counts[i] becomes 1.0
        (pad_zeros_features, model.py:361-364)."""
        counts = jnp.asarray(self.class_counts, jnp.int32)
        col = jnp.arange(self.num_classes)
        mask = col[None, :] < counts[:, None]                # [I, C]
        mask = mask[:, None, None, :]                        # [I,1,1,C]
        return jnp.where(mask, logits, 1.0)

    def __call__(self, image, text: Optional[jnp.ndarray] = None,
                 cross: bool = True, train: bool = True,
                 is_train: Optional[bool] = None):
        """Returns {'logits', 'index', 'aux_logits': None} like MRNNet.forward
        (model.py:343-359).  cross=False routes through the newest expert only
        — callers use the standalone Recognizer for that phase; here cross=True
        paths only."""
        if is_train is None:
            is_train = train
        preds, features = self._expert_forward(image, text, train, is_train)
        scores = self._route_scores(features)
        padded = self._ones_pad(preds)                       # [I,B,T,C]

        if is_train:
            # soft combination (cross_forward, model.py:397-423)
            index = jax.nn.softmax(self.beta * scores, axis=-1)   # [B,I]
            logits = jnp.einsum("ibtc,bi->btc", padded, index,
                                preferred_element_type=jnp.float32)
            return {"logits": logits, "index": index, "aux_logits": None}

        # hard expert pick (cross_forward_expert, model.py:366-395)
        index = jnp.argmax(scores, axis=-1)                  # [B]
        sel = jnp.transpose(padded, (1, 0, 2, 3))            # [B,I,T,C]
        logits = jnp.take_along_axis(
            sel, index[:, None, None, None], axis=1)[:, 0]
        return {"logits": logits, "index": index, "aux_logits": None}


# --------------------------------------------------------------------------
# Expert parameter stacking helpers (learner side)

def pad_expert_tree(params, num_classes: int, prediction: str):
    """Zero-pad an expert's growable leaves to the current class space:
    fc kernel [H, C_i] -> [H, C_total], fc bias, and (Attn) the char-embedding
    rows.  Padded logits are later overwritten by the ones-mask."""

    def pad_axis(arr, axis, target):
        pad = target - arr.shape[axis]
        if pad <= 0:
            return arr
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        return jnp.pad(arr, widths)

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    fc = dict(params["fc"])
    fc["kernel"] = pad_axis(fc["kernel"], 1, num_classes)
    fc["bias"] = pad_axis(fc["bias"], 0, num_classes)
    params = dict(params)
    params["fc"] = fc
    if prediction == "Attn" and "prediction" in params:
        pred = dict(params["prediction"])
        pred["char_embeddings"] = pad_axis(pred["char_embeddings"], 0, num_classes)
        params["prediction"] = pred
    return params


def stack_expert_params(expert_trees: Sequence, num_classes: int,
                        prediction: str):
    """[tree_0 .. tree_{I-1}] -> one tree with leading expert axis."""
    padded = [pad_expert_tree(t, num_classes, prediction) for t in expert_trees]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *padded)


def unstack_expert_stats(stacked, n_experts: int) -> List:
    """Stacked batch_stats -> per-expert list (drift written back after
    router training)."""
    return [jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
            for i in range(n_experts)]
