"""``torchvision.transforms`` shim — only what the reference's Aug="None"
path instantiates: ToTensor (data/dataset.py:240) and Compose.  The
augmentation transforms (used only when opt.Aug != "None") raise if
constructed, keeping the oracle run honest about what it exercises."""

import numpy as np
import torch


class ToTensor:
    """PIL/ndarray HWC uint8 -> CHW float32 in [0, 1] (torchvision semantics)."""

    def __call__(self, pic):
        if not isinstance(pic, np.ndarray):
            pic = np.array(pic, copy=True)
        if pic.ndim == 2:
            pic = pic[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(pic.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            return t.to(torch.float32).div(255.0)
        return t.to(torch.float32)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


def _unsupported(name):
    class _T:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                f"torchvision shim: {name} not implemented (needs Aug=None)")
    _T.__name__ = name
    return _T


Resize = _unsupported("Resize")
RandomApply = _unsupported("RandomApply")
RandomRotation = _unsupported("RandomRotation")
RandomResizedCrop = _unsupported("RandomResizedCrop")
ColorJitter = _unsupported("ColorJitter")
RandomGrayscale = _unsupported("RandomGrayscale")
RandomHorizontalFlip = _unsupported("RandomHorizontalFlip")
