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

Multi-chip (TPU-native design; the reference is single-device,
SURVEY.md section 2.9): two placements keep the fast path alive on a
``data`` mesh —

- **replicated** (default when the cache fits one device's budget): every
  device holds the full cache; the per-device gather of its batch shard is
  purely local, so the step needs zero extra collectives and the sample
  visitation order is *identical* to the single-device run.
- **sharded** (cache fits only in aggregate HBM): samples are split
  contiguously over the mesh's ``data`` axis and each device gathers from
  its own shard via ``shard_map``.  Shuffling is stratified per shard
  (each batch takes batch/N samples from every shard) — same samples per
  epoch, different order than single-device, standard data-parallel
  partitioning semantics.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DEVICE_DATA_BUDGET",
    "cache_nbytes",
    "plan_device_data",
    "upload_cache",
    "epoch_batch_indices",
    "make_gather_step",
]

# Keep well under HBM: data + params + optimizer + activations must coexist.
# Overridable because the right number is workload-dependent (a 1.7M Ctrl
# model at batch 32 leaves ~3x more headroom than the 56M U-Net): env var
# ULTRAZOOM_DEVICE_DATA_BUDGET_GIB, or the trainers'
# --device_data_budget_gib flag.
DEVICE_DATA_BUDGET = int(
    float(os.environ.get("ULTRAZOOM_DEVICE_DATA_BUDGET_GIB", "4")) * (1 << 30)
)


def cache_nbytes(ds) -> int:
    """Total bytes a ``CachedImageFolder`` would occupy on device (uint8)."""
    return int(ds._x.nbytes + ds._y.nbytes + ds._deg.nbytes)


def plan_device_data(
    ds, mesh: Mesh | None, batch_size: int, budget: int | None = None
) -> str | None:
    """Pick a device-resident placement for a cached dataset, or None if it
    must stay host-side.

    Returns "replicated" when the full cache fits one device's budget (on a
    mesh every device holds a copy — gather stays local), "sharded" when it
    only fits in aggregate and the shapes divide the mesh, else None.
    """
    if budget is None:
        budget = DEVICE_DATA_BUDGET
    nbytes = cache_nbytes(ds)
    if nbytes <= budget:
        return "replicated"
    if mesh is None:
        return None
    n_dev = mesh.size
    if (
        nbytes <= budget * n_dev
        and len(ds) % n_dev == 0
        and batch_size % n_dev == 0
        and (len(ds) // n_dev) >= (batch_size // n_dev)
    ):
        return "sharded"
    return None


def upload_cache(ds, mesh: Mesh | None = None, mode: str = "replicated"):
    """One-time H2D upload of a ``CachedImageFolder``'s arrays (uint8).

    With a mesh, "replicated" places a full copy on every device and
    "sharded" splits the sample axis contiguously over the ``data`` axis.
    """
    arrays = {
        "x": np.asarray(ds._x),
        "y": np.asarray(ds._y),
        "y_deg": np.asarray(ds._deg),
    }
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in arrays.items()}
    spec = P() if mode == "replicated" else P("data")
    s = NamedSharding(mesh, spec)
    return {k: jax.device_put(v, s) for k, v in arrays.items()}


def epoch_batch_indices(
    n_samples: int,
    batch_size: int,
    seed: int,
    epoch: int,
    shuffle: bool = True,
    n_shards: int = 1,
) -> Iterator[np.ndarray]:
    """Fixed-shape batch index vectors for one epoch (drop-last), using
    BatchLoader's epoch permutation derivation.

    ``epoch`` is 0-based, matching ``BatchLoader``'s internal counter (its
    first iteration shuffles with ``SeedSequence([seed, 0])``) — trainers
    whose display epoch starts at 1 must pass ``epoch - 1`` for a
    device-resident run to visit samples in the same order as a loader run
    with the same seed.

    With ``n_shards > 1`` (sample-sharded cache), shuffling is stratified:
    segment d of every batch holds batch/n_shards GLOBAL indices drawn from
    shard d's contiguous range, so a shard-local gather never crosses
    devices.  Requires n_samples and batch_size divisible by n_shards.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    if n_shards == 1:
        order = np.arange(n_samples)
        if shuffle:
            rng.shuffle(order)
        for b in range(n_samples // batch_size):
            yield order[b * batch_size : (b + 1) * batch_size].astype(np.int32)
        return

    assert n_samples % n_shards == 0 and batch_size % n_shards == 0
    m = n_samples // n_shards  # samples per shard
    k = batch_size // n_shards  # batch rows per shard
    orders = np.arange(n_samples).reshape(n_shards, m)
    if shuffle:
        for d in range(n_shards):
            rng.shuffle(orders[d])
    for b in range(m // k):
        # (n_shards, k) -> flat: segment d comes from shard d.
        yield orders[:, b * k : (b + 1) * k].reshape(-1).astype(np.int32)


def make_gather_step(
    step_fn: Callable,
    num_extra_static: int = 0,
    mesh: Mesh | None = None,
    mode: str = "replicated",
    n_samples: int | None = None,
) -> Callable:
    """Wrap a ``(state, batch, *extra) -> (state, metrics)`` step into a
    jitted ``(state, data, idx, *extra) -> (state, metrics)`` that gathers
    the batch from device-resident ``data``.  ``data`` is an explicit
    argument (not a closure constant) so the executable never embeds or
    copies it; only ``state`` is donated.  ``num_extra_static`` trailing
    args are static (e.g. the GAN step's ``warmup`` flag).

    With a mesh: state/metrics are replicated and the gathered batch is
    sharded over ``data`` (XLA derives the gradient psum over ICI from the
    shardings, exactly like ``parallel.jit_data_parallel``).  For a
    replicated cache the gather is local; for a "sharded" cache the global
    indices (stratified per shard by ``epoch_batch_indices``) are rebased
    inside ``shard_map`` so each device gathers only from its own shard.
    """

    if mesh is not None and mode == "sharded":
        assert n_samples is not None, "sharded mode needs n_samples"
        per_shard = n_samples // mesh.size

        def _local_gather(data, idx):
            base = jax.lax.axis_index("data").astype(jnp.int32) * per_shard
            return jax.tree.map(lambda a: a[idx - base], data)

        gather = jax.shard_map(
            _local_gather,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
        )
    else:
        gather = lambda data, idx: jax.tree.map(lambda a: a[idx], data)

    def gstep(state, data, idx, *extra):
        batch = gather(data, idx)
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P("data"))
            )
        return step_fn(state, batch, *extra)

    static = tuple(range(3, 3 + num_extra_static))
    if mesh is None:
        return jax.jit(gstep, donate_argnums=0, static_argnums=static)
    rep = NamedSharding(mesh, P())
    idx_s = NamedSharding(mesh, P("data"))
    data_s = rep if mode == "replicated" else NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        gstep,
        in_shardings=(rep, data_s, idx_s),
        out_shardings=(rep, rep),
        donate_argnums=0,
        static_argnums=static,
    )

    def wrapped(state, data, idx, *extra):
        # Host batch indices -> sharded device vector (the only per-step H2D).
        return jitted(state, data, jax.device_put(np.asarray(idx), idx_s), *extra)

    return wrapped
