"""DERNet: dynamically expandable representation — stacked frozen extractors,
concatenated features, growable main head + aux head over the newest slice
(reference: modules/model.py DERNet 203-312, il_modules/der.py).

TPU design: extractors are homogeneous, so their params stack on a leading
axis and run as one vmapped forward; freezing is an optimizer mask, not a
module state.  The fc consumes the concatenated [B, T, I*H] features (CTC) or
feeds an Attention decoder whose input size grows with I (Attn).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrn_tpu.models.attention import AttentionDecoder
from mrn_tpu.models.common import TorchDense
from mrn_tpu.models.composer import Extractor

__all__ = ["DERNet", "extractor_stack", "stack_extractor_params",
           "unstack_extractor_stats"]


def extractor_stack(n_experts: int, transformation: str,
                    feature_extraction: str, sequence_modeling: str,
                    output_channel: int, hidden_size: int, num_fiducial: int,
                    img_size: tuple, name: Optional[str] = None):
    """The vmapped extractor stack, standalone.

    Its variable tree matches DERNet's ``extractors`` subtree, so sliced
    subtrees of a DERNet checkpoint apply directly — the DER learner uses
    this to run frozen experts in eval mode while the newest trains
    (reference model_eval_and_train, il_modules/der.py:38-43)."""
    cls = nn.vmap(
        Extractor,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "droppath": True},
        in_axes=(None, None),
        out_axes=0,
        axis_size=n_experts,
    )
    return cls(transformation, feature_extraction, sequence_modeling,
               output_channel, hidden_size, num_fiducial, img_size,
               name=name)


class DERNet(nn.Module):
    n_experts: int
    num_classes: int
    prediction: str = "CTC"
    transformation: str = "None"
    feature_extraction: str = "VGG"
    sequence_modeling: str = "BiLSTM"
    output_channel: int = 512
    hidden_size: int = 256
    num_fiducial: int = 20
    img_size: tuple = (32, 256)
    batch_max_length: int = 25

    def setup(self):
        self.extractors = extractor_stack(
            self.n_experts, self.transformation, self.feature_extraction,
            self.sequence_modeling, self.output_channel, self.hidden_size,
            self.num_fiducial, self.img_size, name="extractors")
        self.fc = TorchDense(self.num_classes, name="fc")
        self.aux_fc = TorchDense(self.num_classes, name="aux_fc")
        if self.prediction == "Attn":
            self.decoder = AttentionDecoder(
                input_size=self.n_experts * self.hidden_size,
                hidden_size=self.hidden_size, num_classes=self.num_classes,
                generator=self.fc, batch_max_length=self.batch_max_length,
                name="prediction")
            self.aux_decoder = AttentionDecoder(
                input_size=self.hidden_size, hidden_size=self.hidden_size,
                num_classes=self.num_classes, generator=self.aux_fc,
                batch_max_length=self.batch_max_length, name="aux_prediction")

    def __call__(self, image, text: Optional[jnp.ndarray] = None,
                 train: bool = True, is_train: Optional[bool] = None):
        """Returns {'logits', 'aux_logits', 'features'} (model.py:223-254)."""
        if is_train is None:
            is_train = train
        feats = self.extractors(image, train)                # [I,B,T,H]
        return self.heads(feats, text, is_train)

    def heads(self, feats, text: Optional[jnp.ndarray] = None,
              is_train: bool = True):
        """Main + aux predictions from stacked extractor features [I,B,T,H].

        Exposed as an apply-method so the DER learner can feed features from
        a mixed-mode stack (frozen experts eval, newest train)."""
        i, b, t, h = feats.shape
        concat = jnp.transpose(feats, (1, 2, 0, 3)).reshape(b, t, i * h)
        newest = feats[-1]                                   # [B,T,H]

        if self.prediction == "CTC":
            logits = self.fc(concat)
            aux_logits = self.aux_fc(newest)
        else:
            logits = self.decoder(concat, text, is_train)
            aux_logits = self.aux_decoder(newest, text, is_train)
        return {"logits": logits, "aux_logits": aux_logits, "features": concat}


def stack_extractor_params(trees: Sequence):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *trees)


def unstack_extractor_stats(stacked, n_experts: int) -> List:
    return [jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
            for i in range(n_experts)]
