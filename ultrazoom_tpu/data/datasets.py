"""Datasets: blind-degradation training folder and paired LR/HR eval set.

Reference: data.py:26-167 (``ImageFolder``) and data.py:170-221
(``ImagePairs``).  Deliberate divergences from the reference, documented:

* Init-time size filtering reads only image *headers* via PIL (the
  reference decodes every image fully at init, data.py:70-85 — O(dataset)
  decode cost we do not replicate).
* ``ImagePairs`` pairs LR/HR files by sorted relative path (the reference
  relies on raw ``os.walk`` order with no pairing logic, data.py:184-195 —
  fragile; we sort and assert equal counts).
"""

from __future__ import annotations

import os
import pathlib
import warnings

import numpy as np

from ultrazoom_tpu.data.augment import AugmentConfig, augment
from ultrazoom_tpu.data.degradations import DegradationConfig, degrade

__all__ = ["ImageFolder", "ImagePairs", "IMAGE_EXTENSIONS"]

IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".webp", ".gif"}


def _walk_images(root) -> list[pathlib.Path]:
    out = []
    for dirpath, _, filenames in os.walk(root):
        for name in sorted(filenames):
            if pathlib.Path(name).suffix.lower() in IMAGE_EXTENSIONS:
                out.append(pathlib.Path(dirpath) / name)
    out.sort()
    return out


def _load_rgb_u8(path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


class ImageFolder:
    """HR image folder with on-the-fly blind degradation.

    ``__getitem__(i, rng)`` -> dict(x=LR float01 (h, w, 3), y=HR float01,
    y_deg=(3,) normalised degradation strengths).
    """

    def __init__(
        self,
        root_path: str,
        target_resolution: int = 256,
        upscale_ratio: int = 2,
        degradation: DegradationConfig | None = None,
        augmentation: AugmentConfig | None = None,
    ):
        assert target_resolution % upscale_ratio == 0, (
            "target_resolution must be divisible by upscale_ratio"
        )
        self.root = pathlib.Path(root_path)
        self.target = target_resolution
        self.ratio = upscale_ratio
        self.deg_cfg = degradation or DegradationConfig()
        self.aug_cfg = augmentation or AugmentConfig(target_resolution=target_resolution)
        assert self.aug_cfg.target_resolution == target_resolution

        self.paths = []
        from PIL import Image

        for p in _walk_images(self.root):
            try:
                with Image.open(p) as im:
                    w, h = im.size  # header only, no decode
            except Exception as e:  # pragma: no cover - corrupt files
                warnings.warn(f"Skipping unreadable image {p}: {e}")
                continue
            if h < target_resolution or w < target_resolution:
                warnings.warn(
                    f"Skipping {p}: {w}x{h} smaller than target "
                    f"{target_resolution}."
                )
                continue
            self.paths.append(p)
        assert self.paths, f"No usable images under {root_path}"

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx_and_rng) -> dict[str, np.ndarray]:
        idx, rng = idx_and_rng
        hr_full = _load_rgb_u8(self.paths[idx])
        hr = augment(hr_full, self.aug_cfg, rng)
        lr_size = self.target // self.ratio
        x, y_deg = degrade(hr, (lr_size, lr_size), self.deg_cfg, rng)
        return {
            "x": x,
            "y": hr.astype(np.float32) / 255.0,
            "y_deg": y_deg,
        }


class ImagePairs:
    """Paired LR/HR folders for validation (reference data.py:170-221)."""

    def __init__(self, lr_path: str, hr_path: str):
        self.lr_paths = _walk_images(lr_path)
        self.hr_paths = _walk_images(hr_path)
        assert len(self.lr_paths) == len(self.hr_paths) > 0, (
            f"LR/HR counts differ: {len(self.lr_paths)} vs {len(self.hr_paths)}"
        )

    def __len__(self) -> int:
        return len(self.lr_paths)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        return {
            "x": _load_rgb_u8(self.lr_paths[idx]).astype(np.float32) / 255.0,
            "y": _load_rgb_u8(self.hr_paths[idx]).astype(np.float32) / 255.0,
        }
