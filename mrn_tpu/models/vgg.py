"""VGG feature extractor of CRNN (reference: modules/feature_extraction.py:8-47).

Input [B, 32, W, C_in] -> output [B, 1, W/4 - 1, output_channel] (NHWC).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mrn_tpu.models.common import TorchConv, batch_norm, max_pool

__all__ = ["VGGExtractor"]


class VGGExtractor(nn.Module):
    output_channel: int = 512
    quant: str = "none"  # w8a8 PTQ mode for every conv (mrn_tpu.ops.int8)

    @nn.compact
    def __call__(self, x, train: bool = True):
        oc = [self.output_channel // 8, self.output_channel // 4,
              self.output_channel // 2, self.output_channel]
        x = nn.relu(TorchConv(oc[0], (3, 3), padding=(1, 1), quant=self.quant, name="conv0")(x))
        x = max_pool(x, (2, 2), (2, 2))                       # 16 x W/2
        x = nn.relu(TorchConv(oc[1], (3, 3), padding=(1, 1), quant=self.quant, name="conv1")(x))
        x = max_pool(x, (2, 2), (2, 2))                       # 8 x W/4
        x = nn.relu(TorchConv(oc[2], (3, 3), padding=(1, 1), quant=self.quant, name="conv2")(x))
        x = nn.relu(TorchConv(oc[2], (3, 3), padding=(1, 1), quant=self.quant, name="conv3")(x))
        x = max_pool(x, (2, 1), (2, 1))                       # 4 x W/4
        x = TorchConv(oc[3], (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv4")(x)
        x = nn.relu(batch_norm(x, train, name="bn4"))
        x = TorchConv(oc[3], (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv5")(x)
        x = nn.relu(batch_norm(x, train, name="bn5"))
        x = max_pool(x, (2, 1), (2, 1))                       # 2 x W/4
        x = nn.relu(TorchConv(oc[3], (2, 2), quant=self.quant, name="conv6")(x))  # 1 x W/4-1
        return x
