"""Host-side image transforms (PIL + numpy), NHWC float32 output.

Reference: dataset/__init__.py:33-75 (transform compositions; CLIP statistics)
and dataset/randaugment.py (numpy/cv2 RandAugment). Re-implemented on PIL
ImageOps/ImageEnhance/affine — same op set ('Identity', 'AutoContrast',
'Equalize', 'Brightness', 'Sharpness', 'ShearX', 'ShearY', 'TranslateX',
'TranslateY', 'Rotate'), N=2 ops at magnitude 7/10 per image.

Output layout is NHWC (TPU conv-native); the reference emits NCHW tensors.
"""

from __future__ import annotations

import random
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

__all__ = [
    "CLIP_MEAN", "CLIP_STD", "normalize", "to_uint8", "random_resized_crop",
    "hflip", "RandomAugment", "pretrain_transform", "train_transform",
    "test_transform", "box_transform",
]

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize(img: Image.Image) -> np.ndarray:
    """PIL RGB → normalized float32 NHWC array (H, W, 3)."""
    x = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def to_uint8(img: Image.Image) -> np.ndarray:
    """PIL RGB → raw uint8 (H, W, 3); normalization happens ON-DEVICE
    (ops/layers.PatchEmbed uint8 path, bit-identical math) — 4× less
    host→device traffic and no per-image host float pass."""
    return np.asarray(img.convert("RGB"), np.uint8)


def random_resized_crop(img: Image.Image, size: int,
                        scale: Tuple[float, float] = (0.2, 1.0),
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                        rng: Optional[random.Random] = None) -> Image.Image:
    rng = rng or random
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = float(np.exp(rng.uniform(*log_ratio)))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.randint(0, w - cw)
            y0 = rng.randint(0, h - ch)
            return img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
                (size, size), Image.BICUBIC)
    # fallback: center crop
    s = min(w, h)
    x0, y0 = (w - s) // 2, (h - s) // 2
    return img.crop((x0, y0, x0 + s, y0 + s)).resize((size, size), Image.BICUBIC)


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0))


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0))


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, v * img.size[0], 0, 1, 0))


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * img.size[1]))


_AUG_OPS = {
    "Identity": (lambda img, v: img, 0, 0),
    "AutoContrast": (lambda img, v: ImageOps.autocontrast(img), 0, 0),
    "Equalize": (lambda img, v: ImageOps.equalize(img), 0, 0),
    "Brightness": (lambda img, v: ImageEnhance.Brightness(img).enhance(v), 0.1, 1.9),
    "Sharpness": (lambda img, v: ImageEnhance.Sharpness(img).enhance(v), 0.1, 1.9),
    "ShearX": (_shear_x, -0.3, 0.3),
    "ShearY": (_shear_y, -0.3, 0.3),
    "TranslateX": (_translate_x, -0.3, 0.3),
    "TranslateY": (_translate_y, -0.3, 0.3),
    "Rotate": (lambda img, v: img.rotate(v), -30, 30),
}

DEFAULT_AUGS = ["Identity", "AutoContrast", "Equalize", "Brightness", "Sharpness",
                "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate"]
BOX_AUGS = ["Identity", "AutoContrast", "Equalize", "Brightness", "Sharpness"]


class RandomAugment:
    """N random ops at magnitude M/10 (reference randaugment.py:310-339)."""

    def __init__(self, n: int = 2, m: int = 7,
                 augs: Sequence[str] = tuple(DEFAULT_AUGS),
                 rng: Optional[random.Random] = None):
        self.n = n
        self.m = m
        self.augs = list(augs)
        self.rng = rng or random

    def __call__(self, img: Image.Image) -> Image.Image:
        for name in [self.rng.choice(self.augs) for _ in range(self.n)]:
            fn, lo, hi = _AUG_OPS[name]
            v = lo + (hi - lo) * (self.m / 10.0)
            img = fn(img, v)
        return img


def pretrain_transform(image_res: int, rng: Optional[random.Random] = None,
                       as_float: bool = True
                       ) -> Callable[[Image.Image], np.ndarray]:
    """``as_float=False`` emits uint8 and defers normalization to the device
    (PatchEmbed uint8 path) — the pretrain feed-rate lever measured in
    tools/bench_input_pipeline.py."""
    aug = RandomAugment(2, 7, rng=rng)
    rng = rng or random

    def f(img):
        img = random_resized_crop(img, image_res, scale=(0.2, 1.0), rng=rng)
        if rng.random() < 0.5:
            img = hflip(img)
        img = aug(img)
        return normalize(img) if as_float else to_uint8(img)

    return f


def train_transform(image_res: int, with_hflip: bool = True,
                    rng: Optional[random.Random] = None):
    aug = RandomAugment(2, 7, rng=rng)
    rng = rng or random

    def f(img):
        img = random_resized_crop(img, image_res, scale=(0.5, 1.0), rng=rng)
        if with_hflip and rng.random() < 0.5:
            img = hflip(img)
        return normalize(aug(img))

    return f


def box_transform(rng: Optional[random.Random] = None):
    """Augment-only (crop/flip handled bbox-aware by the region datasets)."""
    aug = RandomAugment(2, 7, augs=BOX_AUGS, rng=rng)

    def f(img):
        return normalize(aug(img))

    return f


def test_transform(image_res: int):
    def f(img):
        return normalize(img.convert("RGB").resize((image_res, image_res),
                                                   Image.BICUBIC))

    return f
