"""Spatial crop/pad helpers (NHWC).

``crop_or_pad_to`` replicates the reference decoder's center crop / zero pad
used to reconcile skip-connection shapes on non-multiple-of-8 inputs
(reference: src/ultrazoom/model.py:650-689).  Shapes are static under jit,
so this compiles to a plain slice or pad with no dynamic control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["crop_or_pad_to"]


def _fix_dim(x: jax.Array, axis: int, target: int) -> jax.Array:
    size = x.shape[axis]
    if size > target:
        start = (size - target) // 2
        return jax.lax.slice_in_dim(x, start, start + target, axis=axis)
    if size < target:
        # Reference pads bottom/right-heavy: pad_top = pad // 2.
        total = target - size
        lo = total // 2
        hi = total - lo
        pads = [(0, 0, 0)] * x.ndim
        pads[axis] = (lo, hi, 0)
        return jax.lax.pad(x, jnp.zeros((), x.dtype), pads)
    return x


def crop_or_pad_to(x: jax.Array, target_hw: tuple[int, int]) -> jax.Array:
    """Center-crop or zero-pad NHWC maps to ``target_hw``.

    Matches torch reference semantics exactly: crop start = (size-target)//2,
    pad split = (total//2, total - total//2) with the smaller half first.
    """
    x = _fix_dim(x, 1, target_hw[0])
    x = _fix_dim(x, 2, target_hw[1])
    return x
