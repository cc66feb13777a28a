"""Pixel shuffle / unshuffle with torch channel ordering, NHWC layout.

``torch.nn.PixelShuffle(r)`` maps input channel ``c_out * r^2 + i * r + j``
to output pixel offset ``(i, j)`` of channel ``c_out`` (reference:
src/ultrazoom/model.py:885-930 uses it inside SubpixelConv2d).  We keep that
exact channel convention on the NHWC last axis, so torch conv weights
feeding a shuffle convert with a pure layout transpose — no output-channel
permutation is ever needed (see convert/torch_import.py).

XLA lowers the reshape+transpose to an in-register relayout fused with the
producing conv; there is no materialised intermediate on TPU.
"""

from __future__ import annotations

import jax

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, C*r^2) -> (N, H*r, W*r, C), torch channel order."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    assert c * r * r == crr, f"channels {crr} not divisible by r^2={r * r}"
    x = x.reshape(n, h, w, c, r, r)
    # (n, h, i, w, j, c) -> rows interleave by i, cols by j.
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """(N, H*r, W*r, C) -> (N, H, W, C*r^2), inverse of :func:`pixel_shuffle`."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    assert h * r == hr and w * r == wr
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h, w, c * r * r)
