"""Training observability: TensorBoard scalars + JSONL event log.

Reference: pretrain.py:129,286-299 writes epoch scalars to TensorBoard and
prints to stdout.  We do the same, plus an always-on JSONL stream (one
object per event) so runs are machine-readable without TB installed.
"""

from __future__ import annotations

import json
import pathlib
import time

__all__ = ["ScalarLogger"]


class ScalarLogger:
    def __init__(self, run_dir: str | pathlib.Path, use_tensorboard: bool = True):
        self.run_dir = pathlib.Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.run_dir / "events.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.run_dir))
            except Exception:
                try:
                    from tensorboard.summary.writer.event_file_writer import (  # noqa: F401
                        EventFileWriter,
                    )
                    from tensorboardX import SummaryWriter  # type: ignore

                    self._tb = SummaryWriter(str(self.run_dir))
                except Exception:
                    self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step), "t": time.time()}
            )
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
