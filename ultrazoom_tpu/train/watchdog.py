"""Hang watchdog: convert a wedged device RPC into a loud process failure.

Motivation (observed live in this environment): the tunnel-attached TPU
backend occasionally loses an in-flight call — the trainer then blocks
forever inside a D2H readback or a dispatch, with ~0% CPU, no exception
and no exit.  A supervising queue (tools/queue_r3.sh) retries FAILED
stages, but a *hung* process never fails, so a multi-hour training queue
silently stops making progress.

The watchdog turns "no heartbeat for ``timeout_s`` seconds" into a loud
``os._exit(43)``: the stage fails, the supervisor retries it, and
``--auto_resume`` continues from the last complete checkpoint (saves are
atomic — ``utils/checkpoint.py``) instead of restarting from scratch.

The reference has no analog (its torch loops fail fast on CUDA errors;
see /root/reference/pretrain.py:233-344 for the loop this guards) — this
is operational hardening for remote-attached accelerators, same family
as the NaN rewind guard (train/guard.py).

The trainer beats once per epoch (plus after evals and checkpoint saves),
so ``timeout_s`` must comfortably exceed one epoch INCLUDING first-epoch
compilation (~20-40 s per shape through the remote compiler).  The
default (1800 s) is >4x the slowest epoch observed on this hardware.
"""

from __future__ import annotations

import os
import sys
import threading
import time


def _die(label: str, idle_s: float) -> None:
    print(
        f"[watchdog] {label}: no progress for {idle_s:.0f} s — "
        "assuming a wedged device RPC; exiting 43 so the supervisor "
        "retries (use --auto_resume to continue from the last checkpoint).",
        file=sys.stderr,
        flush=True,
    )
    os._exit(43)


class HangWatchdog:
    """Daemon thread that kills the process when ``beat()`` goes silent.

    ``on_hang`` is injectable for tests; the default exits the process
    with status 43 (distinct from crash codes so queue logs attribute it).
    A ``timeout_s`` of ``None`` or <= 0 disables the watchdog entirely
    (``start`` becomes a no-op and ``beat``/``close`` stay callable).
    """

    EXIT_CODE = 43

    def __init__(self, timeout_s: float | None, label: str = "train", on_hang=None):
        self.timeout_s = timeout_s
        self.label = label
        self._on_hang = on_hang or _die
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @property
    def enabled(self) -> bool:
        return self.timeout_s is not None and self.timeout_s > 0

    def start(self) -> "HangWatchdog":
        if self.enabled and self._thread is None:
            self._last = time.monotonic()
            self._thread = threading.Thread(
                target=self._run, name=f"hang-watchdog-{self.label}", daemon=True
            )
            self._thread.start()
        return self

    def beat(self) -> None:
        self._last = time.monotonic()

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    # -- internal -----------------------------------------------------

    def _run(self) -> None:
        poll = max(0.05, min(30.0, self.timeout_s / 4.0))
        while not self._stop.wait(poll):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                self._on_hang(self.label, idle)
                return
