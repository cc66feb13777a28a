"""NaN checkpoint-and-rewind guard + deterministic replay harness.

Round-2 history: two 56M bf16 U-Net pretrain runs died with sporadic NaNs
(epochs 9 resp. 14) that vanished under ``--debug_nans``; whether that was a
backend transient or a fusion-/timing-sensitive code bug could not be
discriminated (``--debug_nans`` changes fusion AND timing AND memory
pressure).  This module turns that open question into machinery:

* :class:`NanRewindGuard` detects a non-finite epoch, restores the last
  checkpoint, and lets training continue with a perturbed data order;
  bounded by ``max_rewinds`` so a deterministic NaN still fails loudly
  instead of looping forever.
* :func:`replay_epochs` exploits that with device-resident data and a fixed
  seed every epoch is a PURE FUNCTION of (restored state, batch indices):
  re-executing the poisoned span from the last checkpoint discriminates the
  two hypotheses.  Reproduced => real code bug, and the diagnosis names the
  exact step and batch indices to bisect from.  Not reproduced => transient
  (the backend-flakiness interpretation is substantiated by evidence, not
  interpretation).

Diagnoses are appended as JSON lines to ``nan_diagnosis.jsonl`` inside the
checkpoint directory so a post-mortem never depends on scrollback.

The reference has no analog (its failure story is epoch-level ``--resume``,
pretrain.py:215-225); this is the "natural hardening" a preemptible-TPU
training fleet needs.
"""

from __future__ import annotations

import json
import math
import pathlib
import time
from typing import Any, Callable, Iterable, Iterator

__all__ = ["NanRewindGuard", "replay_epochs", "poison_params"]


class NanRewindGuard:
    """Detects non-finite epoch metrics and rewinds to the last checkpoint.

    Usage (inside a ``while epoch <= num_epochs`` trainer loop)::

        guard = NanRewindGuard(checkpoint_path, max_rewinds=3)
        ...
        if guard.tripped(means):
            diagnosis = replay_epochs(...)        # optional, device-resident
            guard.record(epoch, means, diagnosis)
            state, epoch = guard.rewind(checkpointer, state)
            continue

    After a rewind, derive the epoch data order from
    ``seed + guard.seed_offset()`` so the re-run does not replay the exact
    trajectory that just diverged (a transient passes either way; a
    data-order-sensitive instability gets fresh dice).  ``max_rewinds``
    bounds the loop: a deterministic NaN exhausts it and raises.
    """

    def __init__(
        self, checkpoint_path: str, max_rewinds: int = 3, heal_after: int = 8
    ):
        self.checkpoint_path = pathlib.Path(checkpoint_path)
        self.max_rewinds = max_rewinds
        self.rewinds = 0
        # ``max_rewinds`` bounds CONSECUTIVE failures, not run-lifetime ones:
        # a trip more than ``heal_after`` epochs after the previous trip
        # resets the budget (sporadic transients with healthy stretches in
        # between — the guard's raison d'être — must not exhaust it on a
        # long soak; a deterministic NaN re-trips within a couple of epochs
        # every time and still fails loudly).
        self.heal_after = heal_after
        self.last_trip_epoch: int | None = None

    @staticmethod
    def tripped(means: dict[str, float], spike_threshold: float = 0.0) -> bool:
        """True if any epoch-mean metric is non-finite — or, when
        ``spike_threshold`` > 0, exceeds it in magnitude.

        The spike clause exists because the round-2 instability can also
        manifest FINITE: a round-3 56M bf16 run produced one epoch with
        grad_norm ~6e14 and pixel_l2 ~8e8 (recovered only thanks to gradient
        clipping).  Healthy epoch means in every recipe here are O(10), so a
        threshold of 1e6 separates the regimes by five orders of magnitude
        either way.
        """
        return any(
            not math.isfinite(float(v))
            or (spike_threshold > 0.0 and abs(float(v)) > spike_threshold)
            for v in means.values()
        )

    def rewind(self, checkpointer, state_template) -> tuple[Any, int]:
        """Restore the last checkpoint; returns ``(state, resume_epoch)``.

        Waits for in-flight async saves first so the restored checkpoint is
        the newest complete one.  Raises ``RuntimeError`` after
        ``max_rewinds`` consecutive failures (see ``heal_after``).
        """
        from ultrazoom_tpu.utils import restore_state

        self._spend_rewind()
        checkpointer.wait()
        state, meta = restore_state(str(self.checkpoint_path), state_template)
        return state, int(meta["epoch"]) + 1

    def _spend_rewind(self) -> None:
        self.rewinds += 1
        if self.rewinds > self.max_rewinds:
            raise RuntimeError(
                f"NaN guard: {self.rewinds - 1} consecutive rewinds "
                "exhausted — the non-finite loss reproduces across rewinds "
                "and data reorders; see "
                f"{self.checkpoint_path / 'nan_diagnosis.jsonl'}"
            )

    def handle_trip(
        self,
        checkpointer,
        state,
        epoch: int,
        means: dict,
        *,
        replay_step: Callable | None = None,
        index_batches_for_epoch: Callable[[int], Iterable] | None = None,
        loss_key: str = "loss",
        spike_threshold: float = 0.0,
    ) -> tuple[Any, int]:
        """One-stop trip handler for the trainers: wait out async saves,
        restore the last checkpoint ONCE, optionally replay the poisoned
        span from an on-device copy (device-resident data only — pass
        ``replay_step``/``index_batches_for_epoch``), record the diagnosis,
        and rewind.  Returns ``(state, resume_epoch)``.

        The replay runs on ``jnp.copy`` of the restored state because the
        trainers' gather steps donate their state argument — replaying on
        the restored pytree itself would invalidate the very buffers the
        rewind is about to resume from (the reason the trainers previously
        paid two full disk restores + uploads per trip).
        """
        print(
            f"Epoch {epoch}: NON-FINITE/SPIKED metrics {means} — NaN guard "
            "engaged."
        )
        checkpointer.wait()
        if self.last_trip_epoch is not None and (
            epoch - self.last_trip_epoch > self.heal_after
        ):
            self.rewinds = 0  # healthy stretch since the last trip
        self.last_trip_epoch = epoch

        from ultrazoom_tpu.utils import restore_state

        ck_state, ck_meta = restore_state(str(self.checkpoint_path), state)
        diagnosis = None
        if replay_step is not None:
            import jax
            import jax.numpy as jnp

            print(
                f"Replaying epochs {int(ck_meta['epoch']) + 1}..{epoch} from "
                "the last checkpoint to test reproducibility..."
            )
            diagnosis = replay_epochs(
                replay_step,
                index_batches_for_epoch,
                jax.tree.map(jnp.copy, ck_state),
                int(ck_meta["epoch"]) + 1,
                epoch,
                loss_key=loss_key,
                spike_threshold=spike_threshold,
            )
            print(f"Replay diagnosis: {diagnosis}")
        self.record(epoch, means, diagnosis)
        self._spend_rewind()
        resume = int(ck_meta["epoch"]) + 1
        print(f"Rewound to epoch {resume} (rewind #{self.rewinds}).")
        return ck_state, resume

    def seed_offset(self) -> int:
        """Data-order perturbation for the current rewind generation."""
        return self.rewinds * 1_000_003

    def record(self, epoch: int, means: dict, diagnosis: dict | None) -> dict:
        """Append a diagnosis line to ``nan_diagnosis.jsonl``; returns it."""
        entry = {
            "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "epoch": int(epoch),
            "rewinds_so_far": self.rewinds,
            "means": {k: float(v) for k, v in means.items()},
            "replay": diagnosis,
        }
        self.checkpoint_path.mkdir(parents=True, exist_ok=True)
        with open(self.checkpoint_path / "nan_diagnosis.jsonl", "a") as f:
            f.write(json.dumps(entry) + "\n")
        return entry


def replay_epochs(
    run_step: Callable[[Any, Any], tuple[Any, dict]],
    index_batches_for_epoch: Callable[[int], Iterable],
    state: Any,
    from_epoch: int,
    to_epoch: int,
    loss_key: str = "loss",
    spike_threshold: float = 0.0,
) -> dict:
    """Deterministically re-execute epochs ``[from_epoch, to_epoch]`` from a
    restored state and report whether (and exactly where) the NaN reproduces.

    ``run_step(state, idx, epoch) -> (state, metrics)`` must be the
    trainer's own device-resident gather step (pure in (state, indices);
    the epoch is passed so epoch-dependent static flags like the GAN
    warmup phase replay faithfully); ``index_batches_for_epoch(epoch)``
    must yield the identical batch index vectors the original run used.

    Intermediate epochs are re-run at full speed with one finiteness check
    per epoch (a NaN in params poisons every subsequent loss, so the last
    step's loss is a sufficient witness); the final — poisoned — epoch is
    stepped with a per-step check to pinpoint the batch.

    ``spike_threshold`` > 0 extends the witness from "``loss_key``
    non-finite" to "ANY metric non-finite or above the threshold" — needed
    for finite blow-ups, where the balanced-multitask ``loss`` stays at
    #tasks by construction and only per-term metrics (pixel_l2, grad_norm)
    betray the spike; a clipped spike also recovers, so the poisoned
    epoch's per-step sweep is the only place it is visible at all.
    """

    def bad(metrics: dict) -> bool:
        if spike_threshold > 0.0:
            return NanRewindGuard.tripped(metrics, spike_threshold)
        return not math.isfinite(float(metrics[loss_key]))

    m: dict = {}
    for e in range(from_epoch, to_epoch):
        for idx in index_batches_for_epoch(e):
            state, m = run_step(state, idx, e)
        if m and bad(m):
            return {"reproduced": True, "epoch": e, "step": None,
                    "note": "reproduced before the poisoned epoch"}
    for i, idx in enumerate(index_batches_for_epoch(to_epoch)):
        state, m = run_step(state, idx, to_epoch)
        if bad(m):
            return {
                "reproduced": True,
                "epoch": to_epoch,
                "step": i,
                "batch_indices": [int(j) for j in idx],
                "metrics": {k: float(v) for k, v in m.items()},
            }
    return {"reproduced": False, "epoch": to_epoch}


def poison_params(state):
    """Fault injection for guard testing: NaN-poison every param leaf.

    Simulates the observed failure (non-finite params propagating to every
    loss) at a controlled point; used by the trainers' hidden
    ``--inject_nan_epoch`` flag and the guard tests.
    """
    import jax

    nan = lambda t: jax.tree.map(lambda p: p * float("nan"), t)
    if hasattr(state, "params"):  # TrainState
        return state._replace(params=nan(state.params))
    return state._replace(u_params=nan(state.u_params))  # GanTrainState
