"""Image-quality metrics (PSNR / SSIM / VIF) as jitted JAX functions, NHWC.

The reference evaluates with torchmetrics PeakSignalNoiseRatio,
StructuralSimilarityIndexMeasure and VisualInformationFidelity
(pretrain.py:25-29, 209-211).  These are faithful functional ports:

* PSNR: 10 log10(range^2 / mse), mse over the whole batch.
* SSIM: Wang et al., 11x11 gaussian window sigma 1.5, K1=0.01 K2=0.03,
  valid padding, mean over map/channels/batch.
* VIF: pixel-domain visual information fidelity (Sheikh & Bovik), 4 scales
  with 2x gaussian-downsampling between scales, sigma_n_sq = 2 — the same
  algorithm torchmetrics implements; computed per channel then averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["psnr", "ssim", "vif"]


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_valid(x: jax.Array, k2d: np.ndarray) -> jax.Array:
    """Depthwise valid-padding correlation of NHWC x with a 2-D kernel.

    Pinned to HIGHEST precision: SSIM/VIF compute variances as
    ``E[x^2] - mu^2`` — catastrophic cancellation that TPU's default
    bf16-pass f32 convs corrupt badly enough to push SSIM above 1.
    """
    c = x.shape[-1]
    k = jnp.asarray(k2d)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    win = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _depthwise_valid(pred, win)
    mu_t = _depthwise_valid(target, win)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    s_pp = _depthwise_valid(pred * pred, win) - mu_pp
    s_tt = _depthwise_valid(target * target, win) - mu_tt
    s_pt = _depthwise_valid(pred * target, win) - mu_pt

    num = (2 * mu_pt + c1) * (2 * s_pt + c2)
    den = (mu_pp + mu_tt + c1) * (s_pp + s_tt + c2)
    return jnp.mean(num / den)


def _vif_per_channel(
    pred: jax.Array, target: jax.Array, sigma_n_sq: float, eps: float
) -> jax.Array:
    """VIF for (N, H, W, 1) single-channel images; returns (N,) ratios."""
    preds_num = jnp.zeros((pred.shape[0],), jnp.float32)
    target_num = jnp.zeros((pred.shape[0],), jnp.float32)

    for scale in range(1, 5):
        n = 2 ** (5 - scale) + 1
        win = _gaussian_kernel(n, n / 5.0)
        if scale > 1:
            pred = _depthwise_valid(pred, win)[:, ::2, ::2, :]
            target = _depthwise_valid(target, win)[:, ::2, ::2, :]

        mu_t = _depthwise_valid(target, win)
        mu_p = _depthwise_valid(pred, win)
        s_tt = _depthwise_valid(target * target, win) - mu_t * mu_t
        s_pp = _depthwise_valid(pred * pred, win) - mu_p * mu_p
        s_tp = _depthwise_valid(target * pred, win) - mu_t * mu_p
        s_tt = jnp.maximum(s_tt, 0.0)
        s_pp = jnp.maximum(s_pp, 0.0)

        g = s_tp / (s_tt + eps)
        sv_sq = s_pp - g * s_tp

        g = jnp.where(s_tt < eps, 0.0, g)
        sv_sq = jnp.where(s_tt < eps, s_pp, sv_sq)
        s_tt = jnp.where(s_tt < eps, 0.0, s_tt)

        g = jnp.where(s_pp < eps, 0.0, g)
        sv_sq = jnp.where(s_pp < eps, 0.0, sv_sq)

        sv_sq = jnp.where(g < 0.0, s_pp, sv_sq)
        g = jnp.maximum(g, 0.0)
        sv_sq = jnp.maximum(sv_sq, eps)

        preds_num = preds_num + jnp.sum(
            jnp.log10(1.0 + (g**2) * s_tt / (sv_sq + sigma_n_sq)), axis=(1, 2, 3)
        )
        target_num = target_num + jnp.sum(
            jnp.log10(1.0 + s_tt / sigma_n_sq), axis=(1, 2, 3)
        )
    return preds_num / (target_num + 1e-12)


def vif(
    pred: jax.Array,
    target: jax.Array,
    sigma_n_sq: float = 2.0,
    eps: float = 1e-10,
) -> jax.Array:
    """Mean pixel-domain VIF over channels and batch (NHWC input)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    vals = [
        _vif_per_channel(
            pred[..., c : c + 1], target[..., c : c + 1], sigma_n_sq, eps
        )
        for c in range(pred.shape[-1])
    ]
    return jnp.mean(jnp.stack(vals))
