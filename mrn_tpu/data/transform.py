"""Image preprocessing and augmentation (reference: data/dataset.py:144-288,
data/transform.py).

- ``ResizeNormalize``: PIL bicubic resize to (imgW, imgH) then normalize to
  [-1, 1], emitting NHWC float32 (dataset.py:235-246).
- ``TextAugment``: the Blur / Crop / Rot suite (dataset.py:249-288).
- ABINet's CVGeometry/CVDeterioration/CVColorJitter suite (transform.py:41-348)
  in abinet_augment() — cv2-based, applied with the same probabilities.
"""

from __future__ import annotations

import random
from typing import Tuple

import numpy as np
import PIL
import PIL.Image
import PIL.ImageFilter

__all__ = ["MoCoAugment", "ResizeNormalize", "TextAugment", "build_transform"]


def _to_array(image: PIL.Image.Image) -> np.ndarray:
    arr = np.asarray(image, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return (arr - 0.5) / 0.5


class ResizeNormalize:
    def __init__(self, size: Tuple[int, int]):
        self.size = size  # (W, H)

    def __call__(self, image) -> np.ndarray:
        if isinstance(image, np.ndarray) and image.dtype == np.float32:
            return image  # already transformed (ArrayDataset fast path)
        if isinstance(image, (int, np.integer)):
            return image  # bank index (BankDataset): gather happens on device
        image = image.resize(self.size, PIL.Image.BICUBIC)
        return _to_array(image)


class _GaussianBlur:
    def __init__(self, sigma=(0.1, 2.0)):
        self.sigma = sigma

    def __call__(self, image):
        sigma = random.uniform(self.sigma[0], self.sigma[1])
        return image.filter(PIL.ImageFilter.GaussianBlur(radius=sigma))


class _RandomCrop:
    """Aspect-preserving random crop (dataset.py:211-232)."""

    def __init__(self, scale=(1.0, 1.0)):
        self.scale = scale

    def __call__(self, image):
        width, height = image.size
        ratio = random.uniform(self.scale[0], self.scale[1])
        cw, ch = int(width * ratio), int(height * ratio)
        x0 = random.randint(0, width - cw)
        y0 = random.randint(0, height - ch)
        return image.crop((x0, y0, x0 + cw, y0 + ch))


class TextAugment:
    """Aug='Blur5-Crop90-Rot15'-style chains (dataset.py:249-288)."""

    def __init__(self, opt):
        self.opt = opt
        self.steps = []
        for aug in opt.Aug.split("-"):
            if aug.startswith("Blur"):
                maximum = float(aug.strip("Blur"))
                blur = _GaussianBlur((0.1, maximum))
                self.steps.append(lambda im, b=blur: b(im) if random.random() < 0.5 else im)
            elif aug.startswith("Crop"):
                crop_scale = float(aug.strip("Crop")) / 100
                self.steps.append(_RandomCrop((crop_scale, 1.0)))
            elif aug.startswith("Rot"):
                degree = int(aug.strip("Rot"))
                self.steps.append(lambda im, d=degree: im.rotate(
                    random.uniform(-d, d), PIL.Image.BICUBIC, expand=True))
        self.resize = ResizeNormalize((opt.imgW, opt.imgH))

    def __call__(self, image):
        for step in self.steps:
            image = step(image)
        return self.resize(image)


class MoCoAugment:
    """Two random views of one image as (query, key), normalized to [-1, 1]
    (reference MoCo_augment, data/dataset.py:291-317 — MoCo v1's InstDisc
    chain; unused by any reference config, kept for API parity).
    torchvision-free: RandomResizedCrop / grayscale p=0.2 /
    ColorJitter(.4,.4,.4,.4) / horizontal flip via PIL + numpy."""

    def __init__(self, opt):
        self.size = (opt.imgW, opt.imgH)

    @staticmethod
    def _grayscale(image: PIL.Image.Image) -> PIL.Image.Image:
        """RandomGrayscale body; RGBA alpha preserved (convert('L') would
        otherwise reset it to 255), mirroring the hue-branch handling."""
        alpha = image.getchannel("A") if image.mode == "RGBA" else None
        image = image.convert("L").convert(image.mode if alpha is None
                                           else "RGBA")
        if alpha is not None:
            image.putalpha(alpha)
        return image

    def _one_view(self, image: PIL.Image.Image) -> np.ndarray:
        import PIL.ImageEnhance as E

        width, height = image.size
        # RandomResizedCrop(scale=(0.2, 1.0), default ratio (3/4, 4/3))
        area = width * height
        for _ in range(10):
            target = area * random.uniform(0.2, 1.0)
            ratio = np.exp(random.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * ratio)))
            ch = int(round(np.sqrt(target / ratio)))
            if 0 < cw <= width and 0 < ch <= height:
                x0 = random.randint(0, width - cw)
                y0 = random.randint(0, height - ch)
                image = image.crop((x0, y0, x0 + cw, y0 + ch))
                break
        else:
            # torchvision fallback: ratio-clamped center crop
            in_ratio = width / height
            if in_ratio < 3 / 4:
                cw, ch = width, min(height, int(round(width / (3 / 4))))
            elif in_ratio > 4 / 3:
                cw, ch = min(width, int(round(height * (4 / 3)))), height
            else:
                cw, ch = width, height
            x0, y0 = (width - cw) // 2, (height - ch) // 2
            image = image.crop((x0, y0, x0 + cw, y0 + ch))
        image = image.resize(self.size, PIL.Image.BICUBIC)
        if random.random() < 0.2:  # RandomGrayscale
            image = self._grayscale(image)

        # ColorJitter(brightness, contrast, saturation, hue = 0.4) —
        # torchvision applies the four ops in a random order per call
        def _hue(img):
            hue = random.uniform(-0.4, 0.4)
            if abs(hue) > 1e-3 and img.mode in ("RGB", "RGBA"):
                alpha = img.getchannel("A") if img.mode == "RGBA" else None
                h, s, v = img.convert("RGB").convert("HSV").split()
                h = h.point(lambda px: (px + int(hue * 255)) % 256)
                img = PIL.Image.merge("HSV", (h, s, v)).convert("RGB")
                if alpha is not None:
                    img.putalpha(alpha)
            return img

        jitter_ops = [lambda im: E.Brightness(im).enhance(
                          random.uniform(0.6, 1.4)),
                      lambda im: E.Contrast(im).enhance(
                          random.uniform(0.6, 1.4)),
                      lambda im: E.Color(im).enhance(
                          random.uniform(0.6, 1.4)),
                      _hue]
        for op in random.sample(jitter_ops, len(jitter_ops)):
            image = op(image)
        if random.random() < 0.5:  # RandomHorizontalFlip
            image = image.transpose(PIL.Image.FLIP_LEFT_RIGHT)
        return _to_array(image)

    def __call__(self, image):
        return [self._one_view(image), self._one_view(image)]


def build_transform(opt, mode: str = "train"):
    """Pick the per-image transform (reference AlignCollate.__init__,
    dataset.py:172-190)."""
    if opt.Aug == "None" or mode != "train":
        return ResizeNormalize((opt.imgW, opt.imgH))
    if opt.Aug == "ABINet" and mode == "train":
        from mrn_tpu.data.abinet_aug import abinet_transform
        return abinet_transform(opt)
    return TextAugment(opt)
