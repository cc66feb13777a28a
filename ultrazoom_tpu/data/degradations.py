"""Host-side blind-degradation pipeline (NumPy/PIL).

Reference: transforms.py (GaussianBlur / GaussianNoise / JPEGCompression)
and data.py:137-148 — the degradation chain applied to uint8 HR crops is
**blur -> noise -> resize -> JPEG**, then float32 [0, 1] tensorization.

Per-sample degradation strengths are drawn uniformly from configured ranges
and returned min-max normalised to [0, 1] — those normalised strengths are
the QA-head training targets (data.py:150-164).

Semantics notes (torch-parity):

* Blur: sigma ~ U(min, max), kernel_size = 2 * int(3 sigma) + 1
  (transforms.py:39); separable gaussian, reflect padding, computed in
  float and rounded back to uint8 (torchvision uint8 behaviour).
* Noise: additive N(0, sigma) in [0, 1] space, clipped (clip=True,
  transforms.py:76), rounded back to uint8.
* Resize: random choice of {bicubic, bilinear, nearest} (data.py:91-108)
  using our torchvision-parity antialiased matrices (ops/resize.py).
* JPEG: real encode/decode via PIL at quality = int(100 * (1 - c))
  (transforms.py:118).

JPEG is the one stage with no TPU codec, which pins this chain to the host;
it runs on the already-small LR image, so it is cheap, and the loader
(data/loader.py) overlaps it with device compute.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from ultrazoom_tpu.ops.resize import resize_matrix

__all__ = ["DegradationConfig", "degrade", "gaussian_blur_u8", "resize_u8"]


@dataclass(frozen=True)
class DegradationConfig:
    min_gaussian_blur: float = 0.0
    max_gaussian_blur: float = 1.0
    min_gaussian_noise: float = 0.0
    max_gaussian_noise: float = 0.1
    min_compression: float = 0.0
    max_compression: float = 0.8

    def __post_init__(self):
        # The reference requires strict min<max per degradation so the
        # normalised label is well-defined (data.py:53-60).
        assert self.max_gaussian_blur > self.min_gaussian_blur
        assert self.max_gaussian_noise > self.min_gaussian_noise
        assert self.max_compression > self.min_compression


def _gaussian_kernel1d(sigma: float, ksize: int) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _reflect_conv1d(img: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    """Correlate along ``axis`` with reflect ('mirror') padding."""
    r = len(k) // 2
    if r == 0:
        return img
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    padded = np.pad(img, pad, mode="reflect")
    out = np.zeros_like(img, dtype=np.float32)
    sl = [slice(None)] * img.ndim
    for i, w in enumerate(k):
        sl[axis] = slice(i, i + img.shape[axis])
        out += w * padded[tuple(sl)]
    return out


def gaussian_blur_u8(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian blur on (H, W, C) uint8, torchvision kernel-size
    convention; returns uint8."""
    ksize = 2 * int(3 * sigma) + 1
    if ksize <= 1 or sigma <= 0:
        return img
    k = _gaussian_kernel1d(sigma, ksize)
    f = img.astype(np.float32)
    f = _reflect_conv1d(f, k, 0)
    f = _reflect_conv1d(f, k, 1)
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


def _gaussian_noise_u8(img: np.ndarray, sigma: float, rng) -> np.ndarray:
    f = img.astype(np.float32) / 255.0
    f = np.clip(f + rng.normal(0.0, sigma, size=f.shape).astype(np.float32), 0, 1)
    return np.round(f * 255.0).astype(np.uint8)


def resize_u8(img: np.ndarray, out_hw: tuple[int, int], method: str) -> np.ndarray:
    """Antialiased resize of (H, W, C) uint8 via the shared interpolation
    matrices (antialias for bicubic/bilinear, plain for nearest)."""
    h, w, _ = img.shape
    wh = resize_matrix(h, out_hw[0], method, antialias=method != "nearest")
    ww = resize_matrix(w, out_hw[1], method, antialias=method != "nearest")
    f = img.astype(np.float32)
    f = np.einsum("oh,hwc->owc", wh, f)
    f = np.einsum("ow,hwc->hoc", ww, f)
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


def _jpeg_u8(img: np.ndarray, quality: int) -> np.ndarray:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


_RESIZE_METHODS = ("bicubic", "bilinear", "nearest")


def degrade(
    hr_u8: np.ndarray,
    lr_hw: tuple[int, int],
    cfg: DegradationConfig,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    """Apply the blind degradation chain to an (H, W, 3) uint8 HR crop.

    Returns ``(lr_float01, y_deg)`` where ``y_deg`` is the (blur, noise,
    jpeg) strengths min-max normalised to [0, 1].
    """
    blur_sigma = rng.uniform(cfg.min_gaussian_blur, cfg.max_gaussian_blur)
    noise_sigma = rng.uniform(cfg.min_gaussian_noise, cfg.max_gaussian_noise)
    compression = rng.uniform(cfg.min_compression, cfg.max_compression)

    img = gaussian_blur_u8(hr_u8, blur_sigma)
    img = _gaussian_noise_u8(img, noise_sigma, rng)
    img = resize_u8(img, lr_hw, _RESIZE_METHODS[rng.integers(3)])
    img = _jpeg_u8(img, int(100 * (1.0 - compression)))

    y_deg = np.asarray(
        [
            (blur_sigma - cfg.min_gaussian_blur)
            / (cfg.max_gaussian_blur - cfg.min_gaussian_blur),
            (noise_sigma - cfg.min_gaussian_noise)
            / (cfg.max_gaussian_noise - cfg.min_gaussian_noise),
            (compression - cfg.min_compression)
            / (cfg.max_compression - cfg.min_compression),
        ],
        dtype=np.float32,
    )
    return img.astype(np.float32) / 255.0, y_deg
