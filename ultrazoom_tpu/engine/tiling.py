"""Shared overlap-tile geometry: plan, extract, stitch.

Used by both the batch engine (engine/infer.py) and the serving layer
(engine/serve.py).  See engine/infer.py's module docstring for the
overlap-tile design rationale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

__all__ = ["TilePlan", "plan_tiles", "extract_tiles", "stitch_cores"]


@dataclass(frozen=True)
class TilePlan:
    h: int
    w: int
    c: int
    scale: int
    tile: int
    overlap: int
    ny: int
    nx: int

    @property
    def core(self) -> int:
        return self.tile - 2 * self.overlap

    @property
    def num_tiles(self) -> int:
        return self.ny * self.nx


def plan_tiles(
    shape: tuple[int, int, int], scale: int, tile: int, overlap: int
) -> TilePlan:
    h, w, c = shape
    core = tile - 2 * overlap
    assert core > 0
    return TilePlan(
        h, w, c, scale, tile, overlap,
        max(1, math.ceil(h / core)), max(1, math.ceil(w / core)),
    )


def extract_tiles(img: np.ndarray, plan: TilePlan) -> np.ndarray:
    """(H, W, C) -> (ny*nx, tile, tile, C) reflect-padded LR tiles."""
    ov, tile, core = plan.overlap, plan.tile, plan.core
    pad_h = ov + (plan.ny * core - plan.h) + ov
    pad_w = ov + (plan.nx * core - plan.w) + ov
    padded = np.pad(
        img, ((ov, pad_h - ov), (ov, pad_w - ov), (0, 0)), mode="reflect"
    )
    tiles = np.empty((plan.num_tiles, tile, tile, plan.c), img.dtype)
    k = 0
    for iy in range(plan.ny):
        for ix in range(plan.nx):
            y0, x0 = iy * core, ix * core
            tiles[k] = padded[y0 : y0 + tile, x0 : x0 + tile]
            k += 1
    return tiles


def stitch_cores(sr_cores: np.ndarray, plan: TilePlan) -> np.ndarray:
    """(ny*nx, core*s, core*s, C) halo-cropped SR cores -> (H*s, W*s, C)."""
    s = plan.scale
    cores = plan.core * s
    out = np.empty((plan.ny * cores, plan.nx * cores, plan.c), sr_cores.dtype)
    k = 0
    for iy in range(plan.ny):
        for ix in range(plan.nx):
            out[
                iy * cores : (iy + 1) * cores, ix * cores : (ix + 1) * cores
            ] = sr_cores[k]
            k += 1
    return out[: plan.h * s, : plan.w * s]
