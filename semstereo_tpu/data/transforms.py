"""Data augmentation: asymmetric photometric jitter, random crop, random
right-image occlusion, random vertical-disparity perturbation.

Re-designs /root/reference/datasets/sceneflow_dataset_augmentation.py:52-97
and flow_transforms.py:138-159 with numpy/PIL/scipy (no cv2, no torchvision).
All transforms take/return numpy arrays and an explicit
``np.random.Generator`` so the input pipeline is seedable per epoch/host.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img.astype(np.float32) * factor, 0, 255).astype(np.uint8)


def adjust_gamma(img: np.ndarray, gamma: float) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return np.clip(255.0 * np.power(x, gamma), 0, 255).astype(np.uint8)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """torchvision semantics: blend with the mean of the grayscale image."""
    gray_mean = np.asarray(Image.fromarray(img).convert("L"), np.float32).mean()
    return np.clip(
        factor * img.astype(np.float32) + (1 - factor) * gray_mean, 0, 255
    ).astype(np.uint8)


def photometric_jitter(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Asymmetric jitter applied independently per view (reference draws
    brightness U(0.5,2), gamma U(0.8,1.2) and two contrast factors — the
    'saturation' draw is fed to adjust_contrast, sceneflow aug :60-68)."""
    img = adjust_brightness(img, rng.uniform(0.5, 2.0))
    img = adjust_gamma(img, rng.uniform(0.8, 1.2))
    img = adjust_contrast(img, rng.uniform(0.8, 1.2))
    img = adjust_contrast(img, rng.uniform(0.0, 1.4))
    return img


def random_crop(arrays, size, rng: np.random.Generator):
    """Crop every [H, W, ...] array in ``arrays`` at one random (y, x)."""
    th, tw = size
    h, w = arrays[0].shape[:2]
    th, tw = min(th, h), min(tw, w)
    y = int(rng.integers(0, h - th + 1))
    x = int(rng.integers(0, w - tw + 1))
    return [a[y : y + th, x : x + tw] for a in arrays]


def random_occlusion(right: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Fill a random rectangle of the right image with its mean color
    (reference sceneflow aug :91-97), probability 0.5."""
    if rng.binomial(1, 0.5):
        right = right.copy()
        sx = int(rng.uniform(35, 100))
        sy = int(rng.uniform(25, 75))
        cx = int(rng.uniform(sx, max(right.shape[0] - sx, sx + 1)))
        cy = int(rng.uniform(sy, max(right.shape[1] - sy, sy + 1)))
        right[cx - sx : cx + sx, cy - sy : cy + sy] = right.mean(axis=(0, 1))
    return right


def random_vdisp(right: np.ndarray, angle: float, px: float, rng: np.random.Generator) -> np.ndarray:
    """Random small rotation + vertical shift of the right image
    (reference RandomVdisp, flow_transforms.py:138-159)."""
    from scipy import ndimage

    ang = rng.uniform(-angle, angle)
    shift = rng.uniform(-px, px)
    cy = rng.uniform(0, right.shape[0])
    cx = rng.uniform(0, right.shape[1])
    out = right.astype(np.float32)
    if ang != 0.0:
        # rotate about a random center: shift center to origin, rotate, shift back
        theta = np.deg2rad(ang)
        cos, sin = np.cos(theta), np.sin(theta)
        mat = np.array([[cos, -sin], [sin, cos]], np.float32)
        offset = np.array([cy, cx]) - mat @ np.array([cy, cx])
        planes = [
            ndimage.affine_transform(out[..., c], mat, offset=offset, order=1, mode="constant")
            for c in range(out.shape[-1])
        ]
        out = np.stack(planes, axis=-1)
    if shift != 0.0:
        out = np.stack(
            [
                ndimage.shift(out[..., c], (shift, 0.0), order=1, mode="constant")
                for c in range(out.shape[-1])
            ],
            axis=-1,
        )
    return np.clip(out, 0, 255).astype(np.uint8)


def gt_pyramid(arr: np.ndarray, factors=(4, 8, 16)) -> dict[int, np.ndarray]:
    """Nearest-downsampled ground-truth pyramid (reference us3d_.py:178-182).
    Native C++ kernel when available, strided numpy otherwise."""
    from semstereo_tpu.data import native

    arr = np.ascontiguousarray(arr, np.float32)
    out = {}
    for f in factors:
        d = native.downsample_nearest(arr, f)
        out[f] = d if d is not None else np.ascontiguousarray(arr[::f, ::f])
    return out
