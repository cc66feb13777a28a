"""Torch-parity image resize as MXU-friendly separable matmuls.

The reference model's "zoom" branch is ``torch.nn.Upsample(mode="bicubic")``
(reference: src/ultrazoom/model.py:71) which uses the Keys cubic kernel with
a = -0.75 and half-pixel centers (align_corners=False).  ``jax.image.resize``
uses a = -0.5, which differs by up to ~0.016 on a [0, 1] image — far outside
the >=40 dB parity budget (see BASELINE.md).  So we build the interpolation
weights ourselves.

Design (TPU-first): a 1-D resize is a linear map ``out = W @ in`` where ``W``
is an (out_size, in_size) matrix with <=4 (or ~4*scale when antialiasing)
non-zeros per row.  A 2-D resize is two such maps applied separably.  We
materialise ``W`` as a dense matrix at trace time (NumPy, hashed per shape)
and contract it with the image via einsum: the work lands on the MXU as two
large batched matmuls, which on TPU beats a gather-based formulation by a
wide margin and fuses cleanly with neighbouring elementwise ops.  The matmul
does ~in_size/4 redundant MACs per output, but resize is <1% of model FLOPs,
and the MXU executes it at speed-of-light.

Kernel semantics implemented (all verified against torch golden tests):

* ``antialias=False`` — ``torch.nn.functional.interpolate`` semantics:
  half-pixel source centers, fixed 4-tap (cubic) / 2-tap (linear) window,
  out-of-range taps clamped to the border (replicate) by accumulating their
  weight onto the edge pixel.
* ``antialias=True`` — torchvision/PIL semantics used by the reference data
  pipeline (reference: data.py:91-108): kernel support scaled by the
  downscale factor, window clipped to the valid range, weights renormalised
  over the clipped window.
* ``nearest`` — torch legacy nearest: ``src = floor(o * in / out)``.
* ``nearest_exact`` — half-pixel nearest: ``src = floor((o + 0.5) * in/out)``.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize2d",
    "upsample2d",
    "resize_matrix",
]


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter ``a``."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


_KERNELS = {
    # (callable, support radius)
    "bicubic": (lambda x: _cubic_kernel(x, -0.75), 2.0),  # torch convention
    "bicubic_pil": (lambda x: _cubic_kernel(x, -0.5), 2.0),  # PIL/jax convention
    "bilinear": (_linear_kernel, 1.0),
}


@lru_cache(maxsize=512)
def _resize_matrix_np(
    in_size: int, out_size: int, method: str, antialias: bool
) -> np.ndarray:
    """Dense (out_size, in_size) float32 interpolation matrix."""
    if method in ("nearest", "nearest_exact"):
        w = np.zeros((out_size, in_size), dtype=np.float32)
        o = np.arange(out_size, dtype=np.float64)
        scale = in_size / out_size
        if method == "nearest":
            src = np.floor(o * scale).astype(np.int64)
        else:
            src = np.floor((o + 0.5) * scale).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        w[np.arange(out_size), src] = 1.0
        return w

    scale = in_size / out_size
    use_aa = antialias and scale > 1.0
    if method == "bicubic" and use_aa:
        # torch's antialiased bicubic (== torchvision/PIL) uses a = -0.5,
        # unlike its non-antialiased path which uses a = -0.75.
        method = "bicubic_pil"
    kernel, support = _KERNELS[method]
    w = np.zeros((out_size, in_size), dtype=np.float64)
    kscale = scale if use_aa else 1.0

    for o in range(out_size):
        center = (o + 0.5) * scale - 0.5
        if use_aa:
            # torchvision/PIL: clip window to valid range, renormalise.
            lo = int(np.floor(center - support * kscale)) + 1
            hi = int(np.floor(center + support * kscale)) + 1
            lo = max(lo, 0)
            hi = min(hi, in_size)
            idx = np.arange(lo, hi)
            weights = kernel((idx - center) / kscale)
            s = weights.sum()
            if s != 0:
                weights = weights / s
            w[o, idx] = weights
        else:
            # torch interpolate: fixed window around floor(center), taps
            # clamped to the border (replicate padding).
            base = int(np.floor(center))
            t = center - base
            taps = np.arange(base - int(support) + 1, base + int(support) + 1)
            weights = kernel(taps - center)
            # cubic weights sum to 1 identically; keep as-is (torch does).
            _ = t
            idx = np.clip(taps, 0, in_size - 1)
            for i, ww in zip(idx, weights):
                w[o, i] += ww
    return w.astype(np.float32)


def resize_matrix(
    in_size: int, out_size: int, method: str = "bicubic", antialias: bool = False
) -> np.ndarray:
    """Public accessor for the 1-D interpolation matrix (copy-safe)."""
    return _resize_matrix_np(in_size, out_size, method, antialias).copy()


def resize2d(
    x: jax.Array,
    out_hw: tuple[int, int],
    method: str = "bicubic",
    antialias: bool = False,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Resize NHWC images to ``out_hw`` with torch-parity kernels.

    Accumulates in float32 regardless of input dtype (the interpolation
    matrices are f32; XLA contracts bf16 images against them with f32
    accumulation on the MXU).
    """
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    dtype = out_dtype if out_dtype is not None else x.dtype
    if (out_h, out_w) == (h, w):
        return x.astype(dtype)
    wh = jnp.asarray(_resize_matrix_np(h, out_h, method, antialias))
    ww = jnp.asarray(_resize_matrix_np(w, out_w, method, antialias))
    y = x.astype(jnp.float32)
    # (oh, h) x (n, h, w, c) -> (n, oh, w, c)
    y = jnp.einsum("oh,nhwc->nowc", wh, y, precision=jax.lax.Precision.HIGHEST)
    # (ow, w) x (n, oh, w, c) -> (n, oh, ow, c)
    y = jnp.einsum("ow,nhwc->nhoc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def upsample2d(x: jax.Array, scale: int, method: str = "bicubic") -> jax.Array:
    """``torch.nn.Upsample(scale_factor=scale, mode=method)`` parity resize.

    Reference: src/ultrazoom/model.py:71 (the deterministic "zoom" branch).
    """
    n, h, w, c = x.shape
    return resize2d(x, (h * scale, w * scale), method=method, antialias=False)
