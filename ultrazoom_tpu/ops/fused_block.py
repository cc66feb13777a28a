"""Pallas TPU kernel: fused wide-activation residual block.

Computes in ONE kernel what the XLA path runs as several HLOs::

    out = x + conv3x3(silu(film(conv3x3(x, w1)), gamma, beta), w2)

i.e. the MewZoom inverted-bottleneck (reference src/ultrazoom/model.py:
731-778) with optional FiLM conditioning (the Ctrl body) and the residual
add.  The hidden activation — 2x wider than the trunk, the single largest
tensor in the network — lives entirely in VMEM: per 512x512x96 layer the
XLA path writes + reads ~1.6 GB of hidden activations to HBM; this kernel
writes none of it.

Formulation notes (empirically constrained by the current Mosaic backend):

* Overlapping *input* BlockSpecs are inexpressible and sliced manual DMA
  miscompiles, so the caller zero-pads x by 2 (== the two convs'
  padding=1) and materialises (T+4, T+4) halo windows with one fused XLA
  gather; the kernel then uses plain blocked specs.
* Each program runs conv1 as 9 shifted (M, C) @ (C, HC) MXU matmuls with
  f32 accumulation, FiLM + SiLU in registers, conv2 the same way, residual
  add, and writes the (T, T) core.  Halo overcompute is the usual
  overlap-tile trade (~13% at T=32).
* conv2 must see ZERO-padded conv1 output at the true image border (torch
  semantics), but h computed from padded x is nonzero there — so h is
  multiplied by per-tile row/col border masks.  The masks are f32 inputs
  (boolean ``[:, :, None]`` expansion and large 3-D iota both blow the
  16 MB VMEM budget or fail to lower).

STATUS (measured on TPU v5 lite, B8 512x512 C96->192 bf16): XLA's fused
conv pair runs this block at ~17.8 ms standalone / ~11.8 ms inside the
body ``lax.scan``; this kernel at tile=32 runs ~42 ms — the 9 unaligned
shifted-slice relayouts dominate and the halo overcompute adds ~13%.
XLA:TPU's conv path is already near its layout-bound ceiling here (~56-60%
MXU at C=96), so the fused kernel is kept as a correct, tested exemplar
and an **experimental opt-in**, not the default path.

An aligned-shift variant using ``pltpu.roll`` over the full window was also
built and measured: identical ~44 ms (the taps' relayouts were not the
bottleneck; small-K matmul shapes are), and bf16 rolls miscompile outright
on this backend (16-bit packing pairs SUBLANES into 32-bit words, so the
u32-bitcast workaround rolls row *pairs* — wrong for odd shifts).  The
variant was removed; conclusion: beating XLA's conv here requires a
fundamentally different schedule (e.g. K-fused multi-tap im2col in MXU
layout), not tap-shift micro-optimisation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bottleneck_block", "supports_fused_block"]


def _kernel(x_ref, w1_ref, w2_ref, gb_ref, rm_ref, cm_ref, out_ref, *, T, C, HC, film):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    x_tile = x_ref[0, 0, 0]  # (T+4, T+4, C)

    # conv1: valid 3x3 over the (T+2, T+2) intermediate region.
    m1 = (T + 2) * (T + 2)
    acc = jnp.zeros((m1, HC), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xin = x_tile[dy : dy + T + 2, dx : dx + T + 2, :].reshape(m1, C)
            acc += jnp.dot(xin, w1_ref[dy, dx], preferred_element_type=jnp.float32)

    if film:
        gamma = gb_ref[b, :HC].astype(jnp.float32)
        beta = gb_ref[b, HC:].astype(jnp.float32)
        acc = acc * (1.0 + gamma)[None, :] + beta[None, :]
    h = jax.nn.silu(acc)

    # Border mask (see module docstring): outer product of row/col masks.
    mask2d = rm_ref[i][:, None] * cm_ref[j][None, :]  # (T+2, T+2) f32
    h = (h.reshape(T + 2, T + 2, HC) * mask2d[:, :, None]).astype(x_tile.dtype)

    # conv2: valid 3x3 over the (T, T) core.
    m2 = T * T
    acc2 = jnp.zeros((m2, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            hin = h[dy : dy + T, dx : dx + T, :].reshape(m2, HC)
            acc2 += jnp.dot(hin, w2_ref[dy, dx], preferred_element_type=jnp.float32)

    core = x_tile[2 : 2 + T, 2 : 2 + T, :].astype(jnp.float32)
    out_ref[0] = (core + acc2.reshape(T, T, C)).astype(out_ref.dtype)


def supports_fused_block(h: int, w: int, tile: int = 32) -> bool:
    return h % tile == 0 and w % tile == 0


def _extract_halo_tiles(xp: jax.Array, tile: int) -> jax.Array:
    """(B, H+4, W+4, C) -> (B, nh, nw, tile+4, tile+4, C) halo windows."""
    b, hp, wp, c = xp.shape
    nh = (hp - 4) // tile
    nw = (wp - 4) // tile

    def get(i, j):
        return jax.lax.dynamic_slice(
            xp, (0, i * tile, j * tile, 0), (b, tile + 4, tile + 4, c)
        )

    rows = [jnp.stack([get(i, j) for j in range(nw)], axis=1) for i in range(nh)]
    return jnp.stack(rows, axis=1)


def _border_masks(n_tiles: int, size: int, tile: int, extent: int) -> jnp.ndarray:
    """(n_tiles, extent) f32: 0 where the conv1-output row/col at local
    offset ph (global ``i*tile - 1 + ph``) falls outside [0, size)."""
    import numpy as np

    idx = np.arange(n_tiles)[:, None] * tile - 1 + np.arange(extent)[None, :]
    return jnp.asarray(((idx >= 0) & (idx < size)).astype(np.float32))


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_bottleneck_block(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    gamma_beta: jax.Array | None = None,
    tile: int = 32,
) -> jax.Array:
    """``x + conv2(silu(film(conv1(x))))`` fused, NHWC.

    Args:
        x: (B, H, W, C) with H, W divisible by ``tile``.
        w1: (3, 3, C, HC) HWIO kernel.
        w2: (3, 3, HC, C) HWIO kernel.
        gamma_beta: optional (B, 2*HC) FiLM parameters.
        tile: spatial tile edge (32 keeps peak VMEM well inside v5e's 16 MB).
    """
    b, hh, ww, c = x.shape
    hc = w1.shape[-1]
    assert supports_fused_block(hh, ww, tile), (hh, ww, tile)
    film = gamma_beta is not None

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    tiles = _extract_halo_tiles(xp, tile)
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    gb = (
        gamma_beta.astype(jnp.float32)
        if film
        else jnp.zeros((b, 2 * hc), jnp.float32)
    )
    nh, nw = hh // tile, ww // tile
    mask_extent = tile + 2
    row_mask = _border_masks(nh, hh, tile, mask_extent)
    col_mask = _border_masks(nw, ww, tile, mask_extent)

    kernel = functools.partial(_kernel, T=tile, C=c, HC=hc, film=film)
    flops = 2 * b * nh * nw * 9 * c * hc * ((tile + 2) ** 2 + tile**2)
    return pl.pallas_call(
        kernel,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, tile + 4, tile + 4, c),
                lambda b_, i, j: (b_, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c, hc), lambda b_, i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, hc, c), lambda b_, i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            # Whole (B, 2*HC) array in one block; rows picked by program id
            # (TPU lowering wants sublane-divisible or full-size blocks).
            pl.BlockSpec((b, 2 * hc), lambda b_, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, mask_extent), lambda b_, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, mask_extent), lambda b_, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile, c), lambda b_, i, j: (b_, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * tiles.size, transcendentals=b * hh * ww * hc
        ),
    )(tiles, w1, w2, gb, row_mask, col_mask)
