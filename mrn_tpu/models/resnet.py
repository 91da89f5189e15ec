"""FAN-style ResNet feature extractor used by TRBA
(reference: modules/feature_extraction.py:100-352; BasicBlock layout [1,2,5,3],
asymmetric late strides).  Input [B, 32, W, C] -> [B, 1, W/4 + 1, output_channel].
"""

from __future__ import annotations

import flax.linen as nn

from mrn_tpu.models.common import TorchConv, batch_norm, max_pool

__all__ = ["ResNetExtractor"]


class BasicBlock(nn.Module):
    planes: int
    downsample: bool = False
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv1")(x)
        out = nn.relu(batch_norm(out, train, name="bn1"))
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv2")(out)
        out = batch_norm(out, train, name="bn2")
        if self.downsample:
            residual = TorchConv(self.planes, (1, 1), use_bias=False, quant=self.quant, name="down_conv")(x)
            residual = batch_norm(residual, train, name="down_bn")
        return nn.relu(out + residual)


class _Layer(nn.Module):
    planes: int
    blocks: int
    in_planes: int
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = BasicBlock(self.planes, downsample=self.in_planes != self.planes,
                       quant=self.quant, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = BasicBlock(self.planes, quant=self.quant, name=f"block{i}")(x, train)
        return x


class ResNetExtractor(nn.Module):
    output_channel: int = 512
    layers: tuple = (1, 2, 5, 3)
    quant: str = "none"  # w8a8 PTQ mode for every conv (mrn_tpu.ops.int8)

    @nn.compact
    def __call__(self, x, train: bool = True):
        oc = [self.output_channel // 4, self.output_channel // 2,
              self.output_channel, self.output_channel]
        inplanes = self.output_channel // 8

        x = TorchConv(self.output_channel // 16, (3, 3), padding=(1, 1),
                      use_bias=False, quant=self.quant, name="conv0_1")(x)
        x = nn.relu(batch_norm(x, train, name="bn0_1"))
        x = TorchConv(inplanes, (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv0_2")(x)
        x = nn.relu(batch_norm(x, train, name="bn0_2"))

        x = max_pool(x, (2, 2), (2, 2))
        x = _Layer(oc[0], self.layers[0], inplanes, quant=self.quant, name="layer1")(x, train)
        x = TorchConv(oc[0], (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv1")(x)
        x = nn.relu(batch_norm(x, train, name="bn1"))

        x = max_pool(x, (2, 2), (2, 2))
        x = _Layer(oc[1], self.layers[1], oc[0], quant=self.quant, name="layer2")(x, train)
        x = TorchConv(oc[1], (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv2")(x)
        x = nn.relu(batch_norm(x, train, name="bn2"))

        x = max_pool(x, (2, 2), (2, 1), padding=((0, 0), (1, 1)))
        x = _Layer(oc[2], self.layers[2], oc[1], quant=self.quant, name="layer3")(x, train)
        x = TorchConv(oc[2], (3, 3), padding=(1, 1), use_bias=False, quant=self.quant, name="conv3")(x)
        x = nn.relu(batch_norm(x, train, name="bn3"))

        x = _Layer(oc[3], self.layers[3], oc[2], quant=self.quant, name="layer4")(x, train)
        x = TorchConv(oc[3], (2, 2), strides=(2, 1), padding=(0, 1),
                      use_bias=False, quant=self.quant, name="conv4_1")(x)
        x = nn.relu(batch_norm(x, train, name="bn4_1"))
        x = TorchConv(oc[3], (2, 2), use_bias=False, quant=self.quant, name="conv4_2")(x)
        x = nn.relu(batch_norm(x, train, name="bn4_2"))
        return x
