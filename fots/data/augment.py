"""Image augmentation (host, NumPy/cv2) for detection training.

Re-implements the reference's augmentation chain
(tools/data_gen.py:573-576, 636-700) without torchvision/PIL:
border pad, x-shear ("random_perspective"), anisotropic scale, invert,
color jitter + random grayscale, word-centered crop.  All randomness flows
through an explicit ``np.random.Generator`` so the pipeline is
deterministic under a seed (the reference uses global `random`).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def random_border_pad(rng, im, polys, lo=300, hi=500):
    """Pad all four borders by U(lo,hi) px (reference data_gen.py:638-646)."""
    top = int(rng.uniform(lo, hi))
    bottom = int(rng.uniform(lo, hi))
    left = int(rng.uniform(lo, hi))
    right = int(rng.uniform(lo, hi))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT)
    if len(polys) > 0:
        polys[:, :, 0] += left
        polys[:, :, 1] += top
    return im, polys


def random_shear(rng, im, polys, max_shear=0.2):
    """Horizontal shear x' = x + s*y (the effective transform of the
    reference's random_perspective, data_gen.py:189-203)."""
    s = rng.uniform(-max_shear, max_shear)
    M = np.float32([[1, s, 0], [0, 1, 0]])
    im = cv2.warpAffine(im, M, (im.shape[1], im.shape[0]))
    if len(polys) > 0:
        polys[:, :, 0] = polys[:, :, 0] + s * polys[:, :, 1]
    return im, polys


def random_scale(rng, im, polys, lo=0.5, hi=2.0, aniso=(0.8, 1.2)):
    """Random scale, y additionally jittered (reference data_gen.py:655-659)."""
    sx = rng.uniform(lo, hi)
    sy = sx * rng.uniform(*aniso)
    im = cv2.resize(im, dsize=(int(im.shape[1] * sx), int(im.shape[0] * sy)))
    if len(polys) > 0:
        polys[:, :, 0] *= sx
        polys[:, :, 1] *= sy
    return im, polys


def color_jitter(rng, im, brightness=0.3, contrast=0.3, saturation=0.3, hue=0.3,
                 gray_p=0.1):
    """Brightness/contrast/saturation/hue jitter + random grayscale
    (replaces torchvision ColorJitter(.3,.3,.3,.3)+RandomGrayscale(0.1),
    reference data_gen.py:573-576)."""
    im = im.astype(np.float32)
    b = rng.uniform(1 - brightness, 1 + brightness)
    c = rng.uniform(1 - contrast, 1 + contrast)
    im = im * b
    mean = im.mean()
    im = (im - mean) * c + mean
    if im.ndim == 3 and im.shape[2] == 3:
        s = rng.uniform(1 - saturation, 1 + saturation)
        gray = im.mean(axis=2, keepdims=True)
        im = gray + (im - gray) * s
        h = rng.uniform(-hue, hue)
        if abs(h) > 1e-3:
            hsv = cv2.cvtColor(np.clip(im, 0, 255).astype(np.uint8), cv2.COLOR_BGR2HSV)
            hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(h * 90)) % 180
            im = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(np.float32)
        if rng.uniform() < gray_p:
            gray = im.mean(axis=2, keepdims=True)
            im = np.repeat(gray, 3, axis=2)
    return np.clip(im, 0, 255).astype(np.uint8)


def random_invert(rng, im, p=0.1):
    if rng.integers(0, 101) < p * 100:
        return np.invert(im)
    return im


def word_centered_crop(rng, im, crop_hw: Tuple[int, int], polys):
    """Square crop centered near a random word (reference cut_image,
    data_gen.py:206-244), shifting polys into crop coordinates."""
    ch, cw = crop_hw
    if len(polys) > 0:
        for _cnt in range(31):
            poly = polys[int(rng.integers(0, len(polys)))]
            center = poly.sum(0) / 4
            xs = max(int(center[0] - rng.uniform(-100, 100) - cw / 2), 1)
            ys = max(int(center[1] - rng.uniform(-100, 100) - ch / 2), 1)
            crop = im[ys:ys + ch, xs:xs + cw]
            if crop.shape[0] == crop.shape[1]:
                break
        else:
            return im, polys
    else:
        xs = int(rng.uniform(0, im.shape[1]))
        ys = int(rng.uniform(0, im.shape[0]))
        crop = im[ys:ys + ch, xs:xs + cw]
    if len(polys) > 0:
        polys[:, :, 0] -= xs
        polys[:, :, 1] -= ys
    return crop, polys
