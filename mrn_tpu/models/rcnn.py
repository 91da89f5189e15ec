"""RCNN (GRCNN) feature extractor — gated recurrent convolutions
(reference: modules/feature_extraction.py:50-97 RCNN_FeatureExtractor,
113-139 GRCL, 142-162 GRCL_unit).

No reference config selects it (SURVEY.md §2 C13 lists it as unused), but it
is part of the reference's public backbone surface (`--FeatureExtraction
RCNN`), so it ships for completeness.  TPU notes: the 5-step recurrence has
*static* depth with shared recurrent convs (wgr_x / wr_x reused every step,
feature_extraction.py:125-131) and per-step BatchNorm units, so it is
unrolled at trace time — every conv keeps a static shape and lands on the
MXU; no lax.scan is needed (scan would block cross-step fusion for only 5
steps).

Input [B, 32, W, C_in] -> output [B, 1, W/4 + 1, output_channel] (NHWC;
for W=256 the visual sequence length is 65, same as ResNet).
"""

from __future__ import annotations

import flax.linen as nn

from mrn_tpu.models.common import TorchConv, batch_norm, max_pool

__all__ = ["GRCL", "RCNNExtractor"]


class GRCL(nn.Module):
    """Gated recurrent conv layer.  The input projection convs (wgf_u, wf_u)
    run once; the recurrent convs (wgr_x, wr_x) are shared across the
    ``num_iteration`` steps while each step owns its 5 BatchNorms
    (GRCL_unit, feature_extraction.py:142-162)."""

    output_channel: int
    num_iteration: int = 5
    kernel_size: int = 3
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        p = k // 2
        wgf_u = TorchConv(self.output_channel, (1, 1), use_bias=False,
                          quant=self.quant, name="wgf_u")(x)
        wf_u = TorchConv(self.output_channel, (k, k), padding=(p, p),
                         use_bias=False, quant=self.quant, name="wf_u")(x)
        wgr = TorchConv(self.output_channel, (1, 1), use_bias=False,
                        quant=self.quant, name="wgr_x")
        wr = TorchConv(self.output_channel, (k, k), padding=(p, p),
                       use_bias=False, quant=self.quant, name="wr_x")

        h = nn.relu(batch_norm(wf_u, train, name="bn_x_init"))
        for i in range(self.num_iteration):
            gate = nn.sigmoid(
                batch_norm(wgf_u, train, name=f"u{i}_bn_gfu")
                + batch_norm(wgr(h), train, name=f"u{i}_bn_grx"))
            rx = batch_norm(wr(h), train, name=f"u{i}_bn_rx")
            h = nn.relu(
                batch_norm(wf_u, train, name=f"u{i}_bn_fu")
                + batch_norm(rx * gate, train, name=f"u{i}_bn_gx"))
        return h


class RCNNExtractor(nn.Module):
    """GRCNN conv stack (feature_extraction.py:53-97): conv -> pool -> 3x
    (GRCL -> pool) -> 2x2 conv+BN; pools 3 and 4 stride (2,1) with width
    padding 1, mirroring the CRNN-style asymmetric downsampling."""

    output_channel: int = 512
    quant: str = "none"  # w8a8 PTQ mode for every conv (mrn_tpu.ops.int8)

    @nn.compact
    def __call__(self, x, train: bool = True):
        oc = [self.output_channel // 8, self.output_channel // 4,
              self.output_channel // 2, self.output_channel]
        x = nn.relu(TorchConv(oc[0], (3, 3), padding=(1, 1),
                              quant=self.quant, name="conv0")(x))
        x = max_pool(x, (2, 2), (2, 2))                         # 16 x W/2
        x = GRCL(oc[0], quant=self.quant, name="grcl0")(x, train)
        x = max_pool(x, (2, 2), (2, 2))                         # 8 x W/4
        x = GRCL(oc[1], quant=self.quant, name="grcl1")(x, train)
        x = max_pool(x, (2, 2), (2, 1), ((0, 0), (1, 1)))       # 4 x W/4+1
        x = GRCL(oc[2], quant=self.quant, name="grcl2")(x, train)
        x = max_pool(x, (2, 2), (2, 1), ((0, 0), (1, 1)))       # 2 x W/4+2
        x = TorchConv(oc[3], (2, 2), use_bias=False,
                      quant=self.quant, name="conv1")(x)
        x = nn.relu(batch_norm(x, train, name="bn1"))           # 1 x W/4+1
        return x
