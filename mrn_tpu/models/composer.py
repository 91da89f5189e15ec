"""Model composition: the 4-stage pipeline
Transformation -> FeatureExtraction -> AvgPool(H) -> SequenceModeling -> Prediction
(reference: modules/model.py Model_Extractor 17-101 / Model 105-199).

``Extractor`` produces the [B, T, hidden] contextual feature sequence;
``Recognizer`` adds the growable classifier (CTC: fc on features; Attn:
decoder sharing fc as generator) and returns {"predict", "feature"}.

Classifier growth across tasks is functional pytree surgery
(mrn_tpu.models.surgery), not in-place mutation: a Recognizer is re-created
with the new static num_classes and old fc rows are copied in.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mrn_tpu.models.attention import AttentionDecoder
from mrn_tpu.models.common import TorchDense
from mrn_tpu.models.lstm import BidirectionalLSTM
from mrn_tpu.models.rcnn import RCNNExtractor
from mrn_tpu.models.resnet import ResNetExtractor
from mrn_tpu.models.svtr import SVTRExtractor
from mrn_tpu.models.tps import TPSTransformer
from mrn_tpu.models.vgg import VGGExtractor

__all__ = ["Extractor", "Recognizer", "build_recognizer", "sequence_length"]


def sequence_length(feature_extraction: str, img_w: int) -> int:
    """Visual sequence length T for a backbone at width img_w
    (reference hardcodes 63/64/65 for W=256, modules/model.py:322-327)."""
    if feature_extraction == "VGG":
        return img_w // 4 - 1
    if feature_extraction == "SVTR":
        return img_w // 4
    if feature_extraction in ("ResNet", "RCNN"):
        return img_w // 4 + 1
    raise ValueError(feature_extraction)


class Extractor(nn.Module):
    """Trans -> Feat -> mean-over-H -> Seq  (Model_Extractor equivalent)."""

    transformation: str = "None"      # "None" | "TPS"
    feature_extraction: str = "VGG"   # "VGG" | "ResNet" | "SVTR" | "RCNN"
    sequence_modeling: str = "BiLSTM"  # "None" | "BiLSTM"
    output_channel: int = 512
    hidden_size: int = 256
    num_fiducial: int = 20
    img_size: tuple = (32, 256)
    quant: str = "none"  # w8a8 PTQ of the conv feature extractor (ops.int8)

    @nn.compact
    def __call__(self, image, train: bool = True):
        x = image
        if self.transformation == "TPS":
            x = TPSTransformer(self.num_fiducial, self.img_size,
                               name="transformation")(x, train)

        if self.feature_extraction == "VGG":
            feat = VGGExtractor(self.output_channel, quant=self.quant,
                                name="feature")(x, train)
        elif self.feature_extraction == "ResNet":
            feat = ResNetExtractor(self.output_channel, quant=self.quant,
                                   name="feature")(x, train)
        elif self.feature_extraction == "RCNN":
            feat = RCNNExtractor(self.output_channel, quant=self.quant,
                                 name="feature")(x, train)
        elif self.feature_extraction == "SVTR":
            feat = SVTRExtractor(self.output_channel, self.img_size,
                                 quant=self.quant, name="feature")(x, train)
        else:
            raise ValueError(self.feature_extraction)

        # AdaptiveAvgPool2d((None, 1)): average over the height axis -> [B, W, C]
        seq = feat.mean(axis=1)

        if self.sequence_modeling == "BiLSTM":
            seq = BidirectionalLSTM(self.hidden_size, self.hidden_size,
                                    name="seq0")(seq)
            seq = BidirectionalLSTM(self.hidden_size, self.hidden_size,
                                    name="seq1")(seq)
        else:
            # "None" branch still projects to hidden (model.py:75-80)
            seq = TorchDense(self.hidden_size, name="seq_linear")(seq)
        return seq  # [B, T, hidden]


class Recognizer(nn.Module):
    """Extractor + growable prediction head (Model equivalent)."""

    num_classes: int
    prediction: str = "CTC"  # "CTC" | "Attn"
    transformation: str = "None"
    feature_extraction: str = "VGG"
    sequence_modeling: str = "BiLSTM"
    output_channel: int = 512
    hidden_size: int = 256
    num_fiducial: int = 20
    img_size: tuple = (32, 256)
    batch_max_length: int = 25
    quant: str = "none"

    def setup(self):
        self.extractor = Extractor(
            self.transformation, self.feature_extraction, self.sequence_modeling,
            self.output_channel, self.hidden_size, self.num_fiducial,
            self.img_size, self.quant, name="extractor")
        self.fc = TorchDense(self.num_classes, name="fc")
        if self.prediction == "Attn":
            self.decoder = AttentionDecoder(
                input_size=self.hidden_size, hidden_size=self.hidden_size,
                num_classes=self.num_classes, generator=self.fc,
                batch_max_length=self.batch_max_length, name="prediction")

    def __call__(self, image, text: Optional[jnp.ndarray] = None,
                 train: bool = True, is_train: Optional[bool] = None,
                 class_count=None):
        """``train`` drives BN/dropout; ``is_train`` drives the decoder mode
        (teacher forcing vs greedy), defaulting to ``train`` — mirroring the
        reference's separate is_train flag (model.py:133-148).  ``class_count``
        restricts the decoder's effective vocabulary (MRN expert stacking)."""
        if is_train is None:
            is_train = train
        feature = self.extractor(image, train)
        if self.prediction == "CTC":
            predict = self.fc(feature)
        else:
            predict = self.decoder(feature, text, is_train, class_count)
        return {"predict": predict, "feature": feature}

    def features_only(self, image, train: bool = True):
        return self.extractor(image, train)


def build_recognizer(opt, num_classes: int, quant: str = None) -> Recognizer:
    """Construct a Recognizer from a flat options namespace (config surface of
    config/*_mrn.py).  ``quant`` ("calib"/"int8") enables the post-training
    w8a8 conv path for VGG/ResNet feature extractors (mrn_tpu.ops.int8;
    SVTR's Pallas-attention path stays bf16)."""
    return Recognizer(
        num_classes=num_classes,
        prediction=opt.Prediction,
        transformation=opt.Transformation,
        feature_extraction=opt.FeatureExtraction,
        sequence_modeling=opt.SequenceModeling,
        output_channel=opt.output_channel,
        hidden_size=opt.hidden_size,
        num_fiducial=opt.num_fiducial,
        img_size=(opt.imgH, opt.imgW),
        batch_max_length=opt.batch_max_length,
        quant=quant if quant is not None else opt.get("quant", "none"),
    )
