"""Self-describing train-state checkpointing (host-side, dependency-light).

Reference behaviour: a single ``.pt`` dict {epoch, upscaler_args, upscaler,
upscaler_optimizer} overwritten every interval (pretrain.py:334-344), plus
critic state during fine-tuning (fine-tune.py:414-427), restored by
``--resume`` (pretrain.py:215-225).

Format here: a directory with ``meta.json`` (epoch, configs, leaf count)
and ``state.npz`` holding the flattened train-state leaves in pytree order.
Restoring unflattens into the structure of a freshly-initialised state, so
the file stays valid across refactors as long as the pytree structure
matches — the same self-describing property the reference gets from
embedding ``upscaler_args``.  Atomic via write-to-temp + rename (safe under
preemption, the main failure mode on TPU VMs).
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any

import jax
import numpy as np

__all__ = [
    "save_state",
    "restore_state",
    "restore_params_only",
    "latest_meta",
    "AsyncCheckpointer",
]


def save_state(path: str | pathlib.Path, state: Any, meta: dict) -> None:
    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp_npz = p / "state.npz.tmp"
    with open(tmp_npz, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp_npz, p / "state.npz")
    meta = {**meta, "num_leaves": len(leaves)}
    tmp_meta = p / "meta.json.tmp"
    tmp_meta.write_text(json.dumps(meta, indent=2))
    os.replace(tmp_meta, p / "meta.json")


def restore_state(path: str | pathlib.Path, like: Any) -> tuple[Any, dict]:
    """Restore into the structure of ``like`` (a freshly-built state)."""
    p = pathlib.Path(path)
    meta = json.loads((p / "meta.json").read_text())
    with np.load(p / "state.npz") as data:
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    treedef = jax.tree.structure(like)
    like_leaves = jax.tree.leaves(like)
    assert len(like_leaves) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, state expects {len(like_leaves)}"
    )
    cast = [
        np.asarray(l).astype(np.asarray(ref).dtype)
        for l, ref in zip(leaves, like_leaves)
    ]
    return jax.tree.unflatten(treedef, cast), meta


class AsyncCheckpointer:
    """Non-blocking checkpointing: the D2H pull happens on the caller's
    thread (it must — it synchronises with the device), but serialisation
    and disk IO run on a background thread so the next training step starts
    immediately.  ``wait()`` joins the in-flight save (call before exit)."""

    def __init__(self):
        import threading

        self._threading = threading
        self._thread: "threading.Thread | None" = None

    def save(self, path, state, meta: dict) -> None:
        self.wait()
        host_state = jax.device_get(state)

        def _write():
            save_state(path, host_state, meta)

        self._thread = self._threading.Thread(target=_write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def restore_params_only(path: str | pathlib.Path, params_like: Any) -> Any:
    """Restore just the parameters from a train-state checkpoint.

    All train states store params as their FIRST field, so the params
    leaves are a prefix of the flattened state.  This avoids reconstructing
    the (optimizer-dependent) full state skeleton when only weights are
    needed (e.g. fine-tuning from a pretrain checkpoint whose optimizer
    layout differs).  Leaf shapes are verified against ``params_like``.
    """
    p = pathlib.Path(path)
    meta = json.loads((p / "meta.json").read_text())
    like_leaves = jax.tree.leaves(params_like)
    assert meta["num_leaves"] >= len(like_leaves)
    with np.load(p / "state.npz") as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(like_leaves))]
    for got, ref in zip(leaves, like_leaves):
        assert np.asarray(got).shape == np.asarray(ref).shape, (
            f"checkpoint param shape {np.asarray(got).shape} != expected "
            f"{np.asarray(ref).shape} — wrong params structure for this "
            "checkpoint"
        )
    cast = [
        np.asarray(l).astype(np.asarray(ref).dtype)
        for l, ref in zip(leaves, like_leaves)
    ]
    return jax.tree.unflatten(jax.tree.structure(params_like), cast)


def latest_meta(path: str | pathlib.Path) -> dict | None:
    p = pathlib.Path(path) / "meta.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())
