"""ABINet augmentation suite (reference: data/transform.py:12-348 — the
CVGeometry / CVDeterioration / CVColorJitter chain applied when Aug='ABINet',
dataset.py:151-160).

cv2 + numpy + PIL only.  The sampling distributions (asymmetric beta(1,4),
symmetric beta(4,4)) and per-call probability structure follow the reference,
including its quirk that CVGeometry/CVDeterioration freeze their transform
choice at CONSTRUCTION time (transform.py:295-328).
"""

from __future__ import annotations

import math
import random
from typing import Optional

import cv2
import numpy as np
import PIL.Image

from mrn_tpu.data.transform import ResizeNormalize

__all__ = ["CVGeometry", "CVDeterioration", "CVColorJitter", "abinet_transform"]


def sample_asym(magnitude, size=None):
    return np.random.beta(1, 4, size) * magnitude


def sample_sym(magnitude, size=None):
    return (np.random.beta(4, 4, size=size) - 0.5) * 2 * magnitude


def sample_uniform(low, high, size=None):
    return np.random.uniform(low, high, size=size)


def get_interpolation():
    return random.choice([cv2.INTER_NEAREST, cv2.INTER_LINEAR,
                          cv2.INTER_CUBIC, cv2.INTER_AREA])


class CVRandomRotation:
    def __init__(self, degrees=15):
        self.degrees = degrees

    def __call__(self, img):
        angle = sample_sym(self.degrees)
        src_h, src_w = img.shape[:2]
        M = cv2.getRotationMatrix2D((src_w / 2, src_h / 2), angle, 1.0)
        abs_cos, abs_sin = abs(M[0, 0]), abs(M[0, 1])
        dst_w = int(src_h * abs_sin + src_w * abs_cos)
        dst_h = int(src_h * abs_cos + src_w * abs_sin)
        M[0, 2] += (dst_w - src_w) / 2
        M[1, 2] += (dst_h - src_h) / 2
        return cv2.warpAffine(img, M, (dst_w, dst_h), flags=get_interpolation(),
                              borderMode=cv2.BORDER_REPLICATE)


class CVRandomAffine:
    def __init__(self, degrees, translate=None, scale=None, shear=None):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = [shear] if isinstance(shear, (int, float)) else shear

    @staticmethod
    def _inverse_affine_matrix(center, angle, translate, scale, shear):
        if isinstance(shear, (int, float)):
            shear = [shear, 0]
        rot = math.radians(angle)
        sx, sy = [math.radians(s) for s in shear]
        cx, cy = center
        tx, ty = translate
        a = math.cos(rot - sy) / math.cos(sy)
        b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
        c = math.sin(rot - sy) / math.cos(sy)
        d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
        M = [d, -b, 0.0, -c, a, 0.0]
        M = [x / scale for x in M]
        M[2] += M[0] * (-cx - tx) + M[1] * (-cy - ty)
        M[5] += M[3] * (-cx - tx) + M[4] * (-cy - ty)
        M[2] += cx
        M[5] += cy
        return M

    def __call__(self, img):
        src_h, src_w = img.shape[:2]
        angle = sample_sym(self.degrees)
        if self.translate is not None:
            translations = (np.round(sample_sym(self.translate[0] * src_h)),
                            np.round(sample_sym(self.translate[1] * src_h)))
        else:
            translations = (0, 0)
        scale = sample_uniform(*self.scale) if self.scale is not None else 1.0
        if self.shear is not None:
            shear = [sample_sym(self.shear[0]),
                     sample_sym(self.shear[1]) if len(self.shear) == 2 else 0.0]
        else:
            shear = 0.0

        M = np.array(self._inverse_affine_matrix(
            (src_w / 2, src_h / 2), angle, (0, 0), scale, shear)).reshape(2, 3)
        startpoints = [(0, 0), (src_w - 1, 0), (src_w - 1, src_h - 1), (0, src_h - 1)]
        endpoints = [(int(M[0, 0] * x + M[0, 1] * y + M[0, 2]),
                      int(M[1, 0] * x + M[1, 1] * y + M[1, 2]))
                     for x, y in startpoints]
        rect = cv2.minAreaRect(np.array(endpoints))
        bbox = cv2.boxPoints(rect).astype(np.int64)
        dst_w = int(bbox[:, 0].max() - bbox[:, 0].min())
        dst_h = int(bbox[:, 1].max() - bbox[:, 1].min())
        M[0, 2] += (dst_w - src_w) / 2
        M[1, 2] += (dst_h - src_h) / 2
        dst_w += int(abs(translations[0]))
        dst_h += int(abs(translations[1]))
        if translations[0] < 0:
            M[0, 2] += abs(translations[0])
        if translations[1] < 0:
            M[1, 2] += abs(translations[1])
        return cv2.warpAffine(img, M, (max(dst_w, 1), max(dst_h, 1)),
                              flags=get_interpolation(),
                              borderMode=cv2.BORDER_REPLICATE)


class CVRandomPerspective:
    def __init__(self, distortion=0.5):
        self.distortion = distortion

    def __call__(self, img):
        height, width = img.shape[:2]
        oh = sample_asym(self.distortion * height / 2, size=4).astype(np.int64)
        ow = sample_asym(self.distortion * width / 2, size=4).astype(np.int64)
        endpoints = np.array([
            (ow[0], oh[0]), (width - 1 - ow[1], oh[1]),
            (width - 1 - ow[2], height - 1 - oh[2]),
            (ow[3], height - 1 - oh[3])], dtype=np.float32)
        startpoints = np.array([(0, 0), (width - 1, 0), (width - 1, height - 1),
                                (0, height - 1)], dtype=np.float32)
        M = cv2.getPerspectiveTransform(startpoints, endpoints)
        rect = cv2.minAreaRect(endpoints)
        bbox = cv2.boxPoints(rect).astype(np.int64)
        max_x, max_y = int(bbox[:, 0].max()), int(bbox[:, 1].max())
        min_x, min_y = max(int(bbox[:, 0].min()), 0), max(int(bbox[:, 1].min()), 0)
        img = cv2.warpPerspective(img, M, (max(max_x, 1), max(max_y, 1)),
                                  flags=get_interpolation(),
                                  borderMode=cv2.BORDER_REPLICATE)
        return img[min_y:, min_x:]


class CVRescale:
    def __init__(self, factor=4, base_size=(128, 512)):
        self.factor = round(sample_uniform(0, factor)) \
            if isinstance(factor, (int, float)) else round(sample_uniform(*factor))
        self.base_h, self.base_w = base_size[:2]

    def __call__(self, img):
        if self.factor == 0:
            return img
        src_h, src_w = img.shape[:2]
        scale_img = cv2.resize(img, (self.base_w, self.base_h),
                               interpolation=get_interpolation())
        for _ in range(self.factor):
            scale_img = cv2.pyrDown(scale_img)
        return cv2.resize(scale_img, (src_w, src_h),
                          interpolation=get_interpolation())


class CVGaussianNoise:
    def __init__(self, mean=0, var=20):
        self.mean = mean
        self.var = max(int(sample_asym(var)), 1) \
            if isinstance(var, (int, float)) else int(sample_uniform(*var))

    def __call__(self, img):
        noise = np.random.normal(self.mean, self.var ** 0.5, img.shape)
        return np.clip(img + noise, 0, 255).astype(np.uint8)


class CVMotionBlur:
    def __init__(self, degrees=12, angle=90):
        self.degree = max(int(sample_asym(degrees)), 1) \
            if isinstance(degrees, (int, float)) else int(sample_uniform(*degrees))
        self.angle = sample_uniform(-angle, angle)

    def __call__(self, img):
        M = cv2.getRotationMatrix2D((self.degree // 2, self.degree // 2),
                                    self.angle, 1)
        kernel = np.zeros((self.degree, self.degree))
        kernel[self.degree // 2, :] = 1
        kernel = cv2.warpAffine(kernel, M, (self.degree, self.degree))
        kernel = kernel / self.degree
        img = cv2.filter2D(img, -1, kernel)
        return np.clip(img, 0, 255).astype(np.uint8)


class CVGeometry:
    def __init__(self, degrees=15, translate=(0.3, 0.3), scale=(0.5, 2.0),
                 shear=(45, 15), distortion=0.5, p=0.5):
        self.p = p
        type_p = random.random()  # frozen at construction (reference quirk)
        if type_p < 0.33:
            self.transforms = CVRandomRotation(degrees=degrees)
        elif type_p < 0.66:
            self.transforms = CVRandomAffine(degrees=degrees, translate=translate,
                                             scale=scale, shear=shear)
        else:
            self.transforms = CVRandomPerspective(distortion=distortion)

    def __call__(self, img):
        if random.random() < self.p:
            return PIL.Image.fromarray(self.transforms(np.array(img)))
        return img


class CVDeterioration:
    def __init__(self, var, degrees, factor, p=0.5):
        self.p = p
        steps = []
        if var is not None:
            steps.append(CVGaussianNoise(var=var))
        if degrees is not None:
            steps.append(CVMotionBlur(degrees=degrees))
        if factor is not None:
            steps.append(CVRescale(factor=factor))
        random.shuffle(steps)
        self.steps = steps

    def __call__(self, img):
        if random.random() < self.p:
            arr = np.array(img)
            for s in self.steps:
                arr = s(arr)
            return PIL.Image.fromarray(arr)
        return img


class CVColorJitter:
    """torchvision ColorJitter semantics (uniform factor in [max(0,1-x), 1+x],
    hue in [-h, h], random op order) on PIL images — PIL.ImageEnhance-based
    (no torchvision dependency)."""

    def __init__(self, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1,
                 p=0.5):
        self.p = p
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def _jit_hue(img, factor):
        mode = img.mode
        alpha = img.getchannel("A") if "A" in mode else None
        hsv = img.convert("RGB").convert("HSV")
        h, s, v = hsv.split()
        h = h.point(lambda x: (x + int(factor * 255)) % 256)
        out = PIL.Image.merge("HSV", (h, s, v)).convert("RGB")
        if alpha is not None:
            out.putalpha(alpha)
        return out if "A" in mode else out.convert(mode)

    def __call__(self, img):
        if random.random() >= self.p:
            return img
        import PIL.ImageEnhance as IE
        ops = []
        if self.brightness:
            f = random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: IE.Brightness(im).enhance(f))
        if self.contrast:
            f = random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: IE.Contrast(im).enhance(f))
        if self.saturation:
            f = random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: IE.Color(im).enhance(f))
        if self.hue:
            f = random.uniform(-self.hue, self.hue)
            ops.append(lambda im, f=f: self._jit_hue(im, f))
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def abinet_transform(opt):
    """The Aug='ABINet' train transform chain (dataset.py:151-160)."""
    geometry = CVGeometry(degrees=45, translate=(0.0, 0.0), scale=(0.5, 2.0),
                          shear=(45, 15), distortion=0.5, p=0.5)
    deterioration = CVDeterioration(var=20, degrees=6, factor=4, p=0.25)
    color = CVColorJitter(brightness=0.5, contrast=0.5, saturation=0.5,
                          hue=0.1, p=0.25)
    resize = ResizeNormalize((opt.imgW, opt.imgH))

    def apply(img):
        img = geometry(img)
        img = deterioration(img)
        img = color(img)
        return resize(img)

    return apply
