"""``timm.models.layers`` shim: DropPath + trunc_normal_, the only two
symbols the reference's SVTR imports (modules/svtr.py, feature_extraction.py).
Backed by torch's own implementations."""

import torch
import torch.nn as nn
from torch.nn.init import trunc_normal_  # noqa: F401 (re-export)


def drop_path(x, drop_prob: float = 0.0, training: bool = False):
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + torch.rand(shape, dtype=x.dtype,
                                           device=x.device)
    random_tensor.floor_()
    return x.div(keep_prob) * random_tensor


class DropPath(nn.Module):
    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return drop_path(x, self.drop_prob or 0.0, self.training)
