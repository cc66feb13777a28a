"""Host-side augmentations: random crop, horizontal flip, color jitter.

Reference: pretrain.py:131-162 injects RandomCrop(target_resolution),
RandomHorizontalFlip and ColorJitter(brightness/contrast/saturation/hue)
as the pre-transform before degradation.  NumPy equivalents with
torchvision sampling semantics: each jitter factor ~ U(max(0, 1-j), 1+j)
(hue ~ U(-j, j)), applied in a random order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["AugmentConfig", "augment"]


@dataclass(frozen=True)
class AugmentConfig:
    target_resolution: int = 256
    brightness_jitter: float = 0.1
    contrast_jitter: float = 0.1
    saturation_jitter: float = 0.1
    hue_jitter: float = 0.1
    horizontal_flip: bool = True


_GRAY = np.asarray([0.2989, 0.587, 0.114], np.float32)


def _brightness(f, factor):
    return f * factor


def _contrast(f, factor):
    mean = (f @ _GRAY).mean()
    return (f - mean) * factor + mean


def _saturation(f, factor):
    gray = (f @ _GRAY)[..., None]
    return gray + (f - gray) * factor


def _hue(f, shift):
    """Rotate hue by ``shift`` (fraction of a full turn) via HSV."""
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    maxc = f.max(-1)
    minc = f.min(-1)
    v = maxc
    d = maxc - minc
    s = np.where(maxc > 0, d / np.maximum(maxc, 1e-12), 0.0)
    dn = np.maximum(d, 1e-12)
    h = np.where(
        maxc == r, (g - b) / dn % 6.0,
        np.where(maxc == g, (b - r) / dn + 2.0, (r - g) / dn + 4.0),
    )
    h = np.where(d == 0, 0.0, h) / 6.0
    h = (h + shift) % 1.0

    i = np.floor(h * 6.0)
    fr = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * fr)
    t = v * (1 - s * (1 - fr))
    i = i.astype(np.int32) % 6
    out = np.empty_like(f)
    conds = [
        (v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q),
    ]
    for idx, (rr, gg, bb) in enumerate(conds):
        m = i == idx
        out[..., 0] = np.where(m, rr, out[..., 0])
        out[..., 1] = np.where(m, gg, out[..., 1])
        out[..., 2] = np.where(m, bb, out[..., 2])
    return out


def augment(
    img_u8: np.ndarray, cfg: AugmentConfig, rng: np.random.Generator
) -> np.ndarray:
    """Random crop + flip + color jitter on (H, W, 3) uint8; returns uint8
    of shape (target, target, 3)."""
    t = cfg.target_resolution
    h, w, _ = img_u8.shape
    assert h >= t and w >= t, f"image {h}x{w} smaller than crop {t}"
    y = int(rng.integers(0, h - t + 1))
    x = int(rng.integers(0, w - t + 1))
    img = img_u8[y : y + t, x : x + t]

    if cfg.horizontal_flip and rng.uniform() < 0.5:
        img = img[:, ::-1]

    f = img.astype(np.float32) / 255.0
    ops = []
    if cfg.brightness_jitter > 0:
        bf = rng.uniform(max(0, 1 - cfg.brightness_jitter), 1 + cfg.brightness_jitter)
        ops.append(lambda z: _brightness(z, bf))
    if cfg.contrast_jitter > 0:
        cf = rng.uniform(max(0, 1 - cfg.contrast_jitter), 1 + cfg.contrast_jitter)
        ops.append(lambda z: _contrast(z, cf))
    if cfg.saturation_jitter > 0:
        sf = rng.uniform(max(0, 1 - cfg.saturation_jitter), 1 + cfg.saturation_jitter)
        ops.append(lambda z: _saturation(z, sf))
    if cfg.hue_jitter > 0:
        hf = rng.uniform(-cfg.hue_jitter, cfg.hue_jitter)
        ops.append(lambda z: _hue(z, hf))
    for idx in rng.permutation(len(ops)):
        f = np.clip(ops[idx](f), 0.0, 1.0)
    return np.round(f * 255.0).astype(np.uint8)
