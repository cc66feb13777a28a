"""Batch dispatch: route arbitrary inference batch sizes through the fast
compiled batch shapes.

Measured on TPU v5e (bench_suite, 512^2 inputs): XLA picks a pathological
conv strategy for the Ctrl models at intermediate batch sizes — 4X Ctrl runs
84 ms at b1 and 501 ms at b8, but 273 ms at b2 and 590 ms at b4 (b2 is 1.6x
slower than two b1 calls; b4 is slower than b8 in absolute time).  3X shows
the same cliff (b4 273 ms vs b8 208 ms), and the entire "45% FiLM overhead"
observed at 3X b4 disappears at b1/b8 (44.0 vs 44.3 ms, 208.4 vs 208.3 ms)
— it was this conv-strategy hole, not the conditioning.

Rather than fight the compiler per shape, dispatch over anchor batch shapes
that are known-good: full chunks at the large anchor (default 8), and for
the remainder either loop the b1 executable (r <= 5) or pad up to the large
anchor (r >= 6; measured crossover — 4X: 6x84=504 vs 501 padded; 3X r=5:
220 loop vs 208 padded, a 6% loss we accept to favour the 4X headline).
This also caches better: any batch size reuses two executables instead of
compiling its own graph.

The decomposition is value-exact per sample (same weights, same per-sample
math; conv results do not couple across the batch axis).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["dispatch_batched", "PAD_THRESHOLD", "LARGE_ANCHOR"]

LARGE_ANCHOR = 8
PAD_THRESHOLD = 6


def dispatch_batched(
    fn: Callable,
    x,
    *args,
    large: int = LARGE_ANCHOR,
    pad_threshold: int = PAD_THRESHOLD,
):
    """Run ``fn(x, *args)`` over an arbitrary batch by decomposing it into
    known-fast anchor shapes (chunks of ``large`` + a b1 loop or one padded
    call for the remainder).

    ``args`` are per-sample arrays batch-aligned with ``x`` (e.g. the Ctrl
    control vector) or None; they are sliced/padded alongside.  Batches of
    exactly 1, ``large``, or a multiple of ``large`` go straight through.
    """
    b = x.shape[0]
    if b == 0:
        raise ValueError("dispatch_batched: empty batch")
    if b == 1 or b == large:
        return fn(x, *args)

    def call(lo, hi):
        return fn(x[lo:hi], *[None if a is None else a[lo:hi] for a in args])

    outs = []
    i = 0
    while b - i >= large:
        outs.append(call(i, i + large))
        i += large
    r = b - i
    if r:
        if r >= pad_threshold:
            pad = large - r

            def pad_arr(a):
                if a is None:
                    return None
                return jnp.concatenate(
                    [a[i:], jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])]
                )

            out = fn(pad_arr(x), *[pad_arr(a) for a in args])
            outs.append(out[:r])
        else:
            for j in range(i, b):
                outs.append(call(j, j + 1))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
