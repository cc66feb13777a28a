"""Streaming overlap-tile inference engine.

The reference has no tiling: every image size hits a fresh ONNX/torch graph
(dynamic H/W, export_model.ipynb cell-9).  On TPU, compiled shapes are
static, so arbitrary-size inference is restructured as **overlap-tile
decomposition** (the spatial analog of sequence parallelism — SURVEY.md
section 5.7):

* the LR image is reflect-padded and cut into fixed ``tile x tile`` patches
  whose interiors (``tile - 2*overlap``) exactly tile the image;
* patches run through ONE compiled graph in fixed-size batches (a ragged
  tail is padded), so any 4K->8K stream reuses the same executable;
* each SR tile's core is cropped (the ``overlap * scale`` halo absorbs
  receptive-field truncation at tile borders) and written into the output.

``overlap`` >= the network's effective receptive-field halo makes tiled
output match whole-image output to float tolerance in the interior; the
default (16 LR px) is conservative for the flat Ctrl body and nearly exact
for the U-Net (whose 1/8-resolution stages see a wider field — raise it for
bitwise-critical work).

Multi-chip: pass a ``jax.sharding.Mesh`` and tile batches are sharded across
its ``data`` axis (pure data parallelism over tiles; XLA inserts nothing but
the initial scatter and final gather over ICI).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ultrazoom_tpu.engine.ensemble import make_self_ensemble
from ultrazoom_tpu.engine.tiling import extract_tiles, plan_tiles, stitch_cores

__all__ = ["TiledUpscaler"]


class TiledUpscaler:
    """Upscale images of any size through one fixed-shape compiled graph.

    Args:
        upscale_fn: ``f(x: (B, tile, tile, 3)) -> (B, tile*scale, tile*scale, 3)``
            — typically ``partial(model.upscale, params, cfg=cfg)``.  Jitted
            internally; must be shape-polymorphic only in batch via re-jit.
        scale: the model's upscale ratio.
        tile: LR tile size (multiple of 8 keeps the U-Net crop/pad path
            inert; 256 saturates the MXU on v5e for the 14M model).
        overlap: LR halo cropped from every tile border before stitching.
        tile_batch: tiles per device step.
        mesh: optional Mesh; tile batches are sharded over its first axis.
        self_ensemble: run every tile through the x8 geometric
            self-ensemble (engine/ensemble.py) — tiles are square, so the
            model sees ONE 8x-larger batch per device step (~8x FLOPs for
            the classic ~0.1-0.2 dB TTA gain).
    """

    def __init__(
        self,
        upscale_fn: Callable,
        scale: int,
        tile: int = 256,
        overlap: int = 16,
        tile_batch: int = 8,
        mesh: Mesh | None = None,
        output_dtype: str = "float32",
        self_ensemble: bool = False,
    ):
        if self_ensemble:
            upscale_fn = make_self_ensemble(upscale_fn)
        assert tile > 2 * overlap >= 0
        assert output_dtype in ("float32", "uint8")
        if mesh is not None:
            n_dev = mesh.devices.size
            assert tile_batch % n_dev == 0, (
                f"tile_batch ({tile_batch}) must be divisible by the mesh "
                f"device count ({n_dev}) so tile batches shard evenly over "
                f"axis {mesh.axis_names[0]!r} — raise tile_batch or shrink "
                f"the mesh."
            )
        self.scale = scale
        self.tile = tile
        self.overlap = overlap
        self.tile_batch = tile_batch
        self.mesh = mesh
        self.output_dtype = output_dtype

        # The halo crop and (optional) uint8 quantisation happen ON DEVICE:
        # only core pixels cross D2H, and uint8 cuts the transfer 4x — the
        # readback is the dominant cost for 4K+ streams (production PCIe or,
        # far worse, a tunneled dev chip).
        ovs, cores = overlap * scale, (tile - 2 * overlap) * scale

        def wrapped(x):
            y = upscale_fn(x)
            y = y[:, ovs : ovs + cores, ovs : ovs + cores, :]
            if output_dtype == "uint8":
                y = jnp.round(jnp.clip(y.astype(jnp.float32), 0, 1) * 255.0)
                y = y.astype(jnp.uint8)
            return y

        if mesh is not None:
            axis = mesh.axis_names[0]
            in_s = NamedSharding(mesh, P(axis))
            self._fn = jax.jit(wrapped, in_shardings=in_s, out_shardings=in_s)
        else:
            self._fn = jax.jit(wrapped)

    def __call__(self, image: jax.Array | np.ndarray) -> np.ndarray:
        """Upscale (H, W, 3) or (N, H, W, 3); returns numpy at scale x size."""
        img = np.asarray(image)
        if img.ndim == 3:
            return self._one(img)
        return np.stack([self._one(im) for im in img])

    def _one(self, img: np.ndarray) -> np.ndarray:
        plan = plan_tiles(img.shape, self.scale, self.tile, self.overlap)
        tiles = extract_tiles(img, plan)
        sr_cores = self._run_batched(tiles)  # already halo-cropped on device
        return stitch_cores(sr_cores, plan)

    def _run_batched(self, tiles: np.ndarray) -> np.ndarray:
        n = tiles.shape[0]
        b = self.tile_batch
        n_pad = math.ceil(n / b) * b
        if n_pad != n:
            tiles = np.concatenate(
                [tiles, np.zeros((n_pad - n, *tiles.shape[1:]), tiles.dtype)]
            )
        # Dispatch every batch before any D2H readback so the device
        # pipeline stays full; conversion at the end is the only sync.
        outs = [
            self._fn(jnp.asarray(tiles[i : i + b])) for i in range(0, n_pad, b)
        ]
        return np.concatenate([np.asarray(o) for o in outs])[:n]
