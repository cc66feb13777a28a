"""NHWC convolution primitives for TPU.

Thin, explicit wrappers around ``lax.conv_general_dilated`` with
NHWC activations and HWIO kernels — the layouts XLA:TPU tiles onto the MXU
without relayout copies.  All convs accumulate in float32
(``preferred_element_type``) so bf16 compute keeps f32 numerics where it
matters.

Semantics mirror ``torch.nn.Conv2d``: symmetric integer padding, floor
division for strided output sizes (torch ``padding=0, stride=s`` ==
XLA VALID), ``groups`` == ``feature_group_count``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d", "DN_NHWC"]

# (lhs, rhs, out) layout spec shared by every conv in the framework.
DN_NHWC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    groups: int = 1,
    accum_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """2-D convolution, torch ``Conv2d`` semantics, NHWC/HWIO layout.

    Args:
        x: (N, H, W, C_in) activations.
        weight: (kh, kw, C_in // groups, C_out) kernel.
        bias: optional (C_out,).
        stride / padding: int or (h, w) pair, symmetric padding.
        groups: feature group count (``groups == C_in`` -> depthwise).
        accum_dtype: accumulator dtype passed to XLA (default f32).

    Returns (N, H', W', C_out) in ``x.dtype``.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    # Same-dtype conv, NO preferred_element_type: the MXU accumulates a
    # bf16 pass in f32 internally regardless, and an explicit f32 upcast
    # breaks autodiff (the transpose rule builds a conv over the f32
    # cotangent and the bf16 kernel -> dtype-mismatch error).
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=DN_NHWC,
        feature_group_count=groups,
    )
    if bias is not None:
        out = (out.astype(accum_dtype) + bias.astype(accum_dtype)).astype(
            out.dtype
        )
    return out
