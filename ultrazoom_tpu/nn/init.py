"""Weight initializers matching torch semantics on HWIO conv kernels.

The reference initializes convs two ways (src/ultrazoom/model.py:104-109,
:752-754): torch's ``Conv2d`` default (``kaiming_uniform_(a=sqrt(5))`` plus a
uniform fan-in bias) at construction, and explicit ``kaiming_uniform_()``
(a=0) via ``initialize_weights``.  Both are reproduced here so fresh JAX
models are distributionally identical to fresh torch models.

fan_in for an HWIO kernel (kh, kw, I, O) is ``kh * kw * I`` — identical to
torch's OIHW fan_in because grouping is already folded into I.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["kaiming_uniform", "conv_default_weight", "conv_default_bias"]


def _fan_in(shape_hwio: tuple[int, ...]) -> int:
    kh, kw, i, _ = shape_hwio
    return kh * kw * i


def kaiming_uniform(
    key: jax.Array, shape_hwio: tuple[int, ...], a: float = 0.0,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """``torch.nn.init.kaiming_uniform_`` on an HWIO kernel."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / _fan_in(shape_hwio))
    return jax.random.uniform(key, shape_hwio, dtype, -bound, bound)


def conv_default_weight(
    key: jax.Array, shape_hwio: tuple[int, ...], dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """torch ``Conv2d`` default weight init: kaiming_uniform with a=sqrt(5)."""
    return kaiming_uniform(key, shape_hwio, a=math.sqrt(5.0), dtype=dtype)


def conv_default_bias(
    key: jax.Array, shape_hwio: tuple[int, ...], dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """torch ``Conv2d`` default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(_fan_in(shape_hwio))
    return jax.random.uniform(key, (shape_hwio[-1],), dtype, -bound, bound)
