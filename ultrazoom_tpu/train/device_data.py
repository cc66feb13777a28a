"""Device-resident training data: upload the sample cache to HBM once,
gather batches on device.

For cached datasets (``data/cached.py``) that fit comfortably in HBM
alongside the model, per-step host->device batch transfer is pure waste:
upload the uint8 arrays once and index them on device.  A 240-image x 30
variant 2X cache is 1.77 GB uint8 — ~11% of a v5e's HBM — and turns a
transfer-bound loop (measured 0.98 s/step f32 / ~0.25 s/step uint8 through
a narrow H2D link) into a compute-bound one (the only per-step H2D is the
(batch,) int32 index vector).

The gather (``data[k][idx]``) and the uint8->f32 normalisation
(``steps.as_float01``) both run on device inside the jitted step.
Shuffling reproduces ``BatchLoader``'s epoch permutation
(``SeedSequence([seed, epoch])``), so a device-resident run visits samples
in the same order as a loader run with the same seed.
"""

from __future__ import annotations

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DEVICE_DATA_BUDGET",
    "cache_nbytes",
    "upload_cache",
    "epoch_batch_indices",
    "make_gather_step",
]

# Keep well under HBM: data + params + optimizer + activations must coexist.
DEVICE_DATA_BUDGET = 4 << 30


def cache_nbytes(ds) -> int:
    """Total bytes a ``CachedImageFolder`` would occupy on device (uint8)."""
    return int(ds._x.nbytes + ds._y.nbytes + ds._deg.nbytes)


def upload_cache(ds) -> dict[str, jax.Array]:
    """One-time H2D upload of a ``CachedImageFolder``'s arrays (uint8)."""
    return {
        "x": jnp.asarray(np.asarray(ds._x)),
        "y": jnp.asarray(np.asarray(ds._y)),
        "y_deg": jnp.asarray(np.asarray(ds._deg)),
    }


def epoch_batch_indices(
    n_samples: int,
    batch_size: int,
    seed: int,
    epoch: int,
    shuffle: bool = True,
) -> Iterator[np.ndarray]:
    """Fixed-shape batch index vectors for one epoch (drop-last), using
    BatchLoader's epoch permutation derivation.

    ``epoch`` is 0-based, matching ``BatchLoader``'s internal counter (its
    first iteration shuffles with ``SeedSequence([seed, 0])``) — trainers
    whose display epoch starts at 1 must pass ``epoch - 1`` for a
    device-resident run to visit samples in the same order as a loader run
    with the same seed."""
    order = np.arange(n_samples)
    if shuffle:
        np.random.default_rng(np.random.SeedSequence([seed, epoch])).shuffle(order)
    for b in range(n_samples // batch_size):
        yield order[b * batch_size : (b + 1) * batch_size].astype(np.int32)


def make_gather_step(step_fn: Callable, num_extra_static: int = 0) -> Callable:
    """Wrap a ``(state, batch, *extra) -> (state, metrics)`` step into a
    jitted ``(state, data, idx, *extra) -> (state, metrics)`` that gathers
    the batch from device-resident ``data``.  ``data`` is an explicit
    argument (not a closure constant) so the executable never embeds or
    copies it; only ``state`` is donated.  ``num_extra_static`` trailing
    args are static (e.g. the GAN step's ``warmup`` flag)."""

    def gstep(state, data, idx, *extra):
        batch = jax.tree.map(lambda a: a[idx], data)
        return step_fn(state, batch, *extra)

    static = tuple(range(3, 3 + num_extra_static))
    return jax.jit(gstep, donate_argnums=0, static_argnums=static)
