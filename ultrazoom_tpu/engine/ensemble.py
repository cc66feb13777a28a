"""Geometric self-ensemble (x8 test-time augmentation) for SR inference.

The dihedral group D4 (4 rotations x horizontal flip) acts on images; an
ideal SR operator is equivariant under it.  A trained network is only
approximately so, and averaging the 8 back-transformed predictions
cancels the anisotropic part of its error — the classic "self-ensemble"
evaluation mode of the SR literature (EDSR, Lim et al. 2017, sec. 3.4;
also RCAN, SwinIR "+" results), typically worth ~0.1-0.2 dB PSNR at no
training cost.  The reference has no counterpart (its deployment story
is one ONNX pass per image, README.md:131-222); this is a TPU-native
extension.

TPU formulation: instead of 8 sequential model calls (8 traced copies of
the network in one graph, or 8 dispatches), the transformed views are
**concatenated along the batch axis** and run through the model once —
the MXU sees an 8x larger batch, which it prefers, and the graph
contains a single network instantiation.  Non-square inputs need two
calls (90/270-degree rotations swap H and W, so those views form a
second fixed shape); square inputs (e.g. every tile in the overlap-tile
engine) need exactly one.

All transforms are pure layout ops (``rot90``/``flip``); XLA fuses them
into the surrounding copies, so the ensemble costs ~8x the model FLOPs
and nothing else.  Works under ``jit``, ``vmap`` over batch, and inside
the tiled/serving engines (wrap ``upscale_fn`` with
:func:`make_self_ensemble` — ``TiledUpscaler(..., self_ensemble=True)``
does it for you).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["DIHEDRAL", "make_self_ensemble", "transform", "untransform"]

# (k, flip): rotate by k*90 degrees (axes H, W), then flip along W.
DIHEDRAL: tuple[tuple[int, bool], ...] = tuple(
    (k, flip) for k in range(4) for flip in (False, True)
)


def transform(x: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """Apply one D4 element to an NHWC batch (static ``k``/``flip``)."""
    x = jnp.rot90(x, k, axes=(1, 2))
    return jnp.flip(x, axis=2) if flip else x


def untransform(y: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """Inverse of :func:`transform` (rotations commute with upscaling)."""
    if flip:
        y = jnp.flip(y, axis=2)
    return jnp.rot90(y, -k, axes=(1, 2))


def make_self_ensemble(upscale_fn: Callable) -> Callable:
    """Wrap ``f(x: (B,H,W,C)) -> (B,sH,sW,C)`` into its x8 self-ensemble.

    ``upscale_fn`` must accept any batch size that is a multiple of the
    caller's (the wrapper calls it with ``8B`` for square inputs, twice
    with ``4B`` otherwise).  Closures that carry per-image side inputs
    (e.g. a control vector) should tile them by ``x.shape[0] // B``.
    """

    def ensembled(x: jnp.ndarray) -> jnp.ndarray:
        square = x.shape[1] == x.shape[2]
        groups = (
            [DIHEDRAL]
            if square
            # 90/270-degree views have transposed spatial shape: separate call.
            else [
                tuple(e for e in DIHEDRAL if e[0] % 2 == 0),
                tuple(e for e in DIHEDRAL if e[0] % 2 == 1),
            ]
        )
        acc = None
        for elems in groups:
            xt = jnp.concatenate([transform(x, k, f) for k, f in elems], axis=0)
            yt = upscale_fn(xt)
            for (k, f), y in zip(elems, jnp.split(yt, len(elems), axis=0)):
                yi = untransform(y, k, f)
                acc = yi if acc is None else acc + yi
        return acc / float(len(DIHEDRAL))

    return ensembled
