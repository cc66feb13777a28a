"""Correctness tests for the Pallas fused inverted-bottleneck kernel.

Runs in interpreter mode on the CPU test backend; the kernel's TPU compile
path was validated on hardware (see ops/fused_block.py STATUS note).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ultrazoom_tpu.ops import conv2d

pytestmark = pytest.mark.slow  # excluded from the fast default subset


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _ref(x, w1, w2, gb=None):
    h = conv2d(x, w1, padding=1)
    if gb is not None:
        g, be = jnp.split(gb.astype(x.dtype), 2, axis=-1)
        h = h * (1 + g[:, None, None, :]) + be[:, None, None, :]
    h = jax.nn.silu(h)
    return x + conv2d(h, w2, padding=1)


@pytest.mark.parametrize("film", [True, False])
@pytest.mark.parametrize("shape", [(1, 8, 8), (2, 16, 8)])
def test_fused_block_matches_xla(film, shape):
    from ultrazoom_tpu.ops.fused_block import fused_bottleneck_block

    b, h, w = shape
    c, hc = 4, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, hc)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.normal(size=(3, 3, hc, c)).astype(np.float32) * 0.2)
    gb = (
        jnp.asarray(rng.normal(size=(b, 2 * hc)).astype(np.float32) * 0.5)
        if film
        else None
    )

    want = _ref(x, w1, w2, gb)
    got = fused_bottleneck_block(x, w1, w2, gb, tile=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_block_shape_guard():
    from ultrazoom_tpu.ops.fused_block import supports_fused_block

    assert supports_fused_block(512, 512, 32)
    assert not supports_fused_block(100, 100, 32)
