"""NHWC convolution primitives for TPU.

Thin, explicit wrappers around ``lax.conv_general_dilated`` with
NHWC activations and HWIO kernels — the layouts XLA:TPU tiles onto the MXU
without relayout copies.

Precision policy (measured on v5e): the forward conv requests
``preferred_element_type=f32`` — bf16 inputs with f32 accumulation, which
XLA codegens ~15% faster end-to-end than same-dtype bf16 output convs for
this workload.  That upcast breaks ``lax``'s builtin conv transpose (the
f32 cotangent meets the bf16 kernel -> dtype mismatch), so the op carries a
``custom_vjp``: gradients are the VJP of the *same-dtype* conv with the
cotangent cast to the input dtype — exactly torch-AMP semantics (bf16
gradient math, f32 master weights outside).

Semantics mirror ``torch.nn.Conv2d``: symmetric integer padding, floor
division for strided output sizes (torch ``padding=0, stride=s`` ==
XLA VALID), ``groups`` == ``feature_group_count`` — the conv flavours the
reference model uses (3x3 pad-1, k=s strided PixelCrush, depthwise k7;
reference src/ultrazoom/model.py:742-747, 857-863, 1295-1302).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d", "DN_NHWC"]

# (lhs, rhs, out) layout spec shared by every conv in the framework.
DN_NHWC = ("NHWC", "HWIO", "NHWC")


def _conv_raw(x, w, stride, pad, groups, preferred):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=DN_NHWC,
        feature_group_count=groups,
        preferred_element_type=preferred,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_f32acc(x, w, stride, pad, groups):
    """Forward: f32-accumulated conv (fast path).  Output dtype f32."""
    return _conv_raw(x, w, stride, pad, groups, jnp.float32)


def _conv_f32acc_fwd(x, w, stride, pad, groups):
    return _conv_f32acc(x, w, stride, pad, groups), (x, w)


def _conv_f32acc_bwd(stride, pad, groups, res, g):
    x, w = res

    def same_dtype_conv(x_, w_):
        return _conv_raw(x_, w_, stride, pad, groups, None)

    _, vjp = jax.vjp(same_dtype_conv, x, w)
    dx, dw = vjp(g.astype(x.dtype))
    return dx, dw


_conv_f32acc.defvjp(_conv_f32acc_fwd, _conv_f32acc_bwd)


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
        accum_dtype: accumulator dtype (default f32; see module docstring).

    Returns (N, H', W', C_out) in ``x.dtype``.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = _conv_f32acc(x, weight.astype(x.dtype), stride, pad, groups)
    if bias is not None:
        out = out + bias.astype(accum_dtype)
    return out.astype(x.dtype)
