"""Device-mesh utilities for data-parallel training and tile-parallel
inference.

The reference is strictly single-device (SURVEY.md section 2.9: no
torch.distributed anywhere); parallelism here is therefore a TPU-native
design, not a port: a 1-D ``data`` mesh, batch sharded across it, params
replicated, and XLA inserting the gradient all-reduce over ICI from the
sharding constraints alone.  A 2-D ``(data, model)`` mesh constructor is
provided for headroom (e.g. channel-sharding the big U-Net configs), though
no shipped config needs it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "jit_data_parallel",
]


def make_mesh(devices=None, axis_names=("data",), shape=None) -> Mesh:
    """1-D (default) or N-D mesh over the given (or all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    arr = np.array(devs)
    if shape is not None:
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh | None:
    """1-D data mesh over the largest device count that divides the batch.

    Returns None when only one device would be used (caller should fall
    back to plain jit).
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    return make_mesh(devs[:n])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch pytree with the batch axis sharded."""
    s = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def jit_data_parallel(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a ``step(state, batch) -> (state, metrics)`` function with
    replicated state and batch-sharded inputs.

    XLA derives the psum over ICI for the gradient reduction from these
    shardings — no explicit collectives in user code.
    """
    rep = replicated(mesh)
    data = batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
