"""Threaded prefetching batch loader feeding the device.

The reference uses torch DataLoader with 8 worker *processes*
(pretrain.py:164-172).  Here the pipeline is NumPy/PIL (which release the
GIL for the heavy parts), so a thread pool + a small prefetch queue gives
the same overlap without pickling costs, and the final ``jax.device_put``
double-buffers H2D against the jitted step.

Batches are fixed-shape (``drop_last`` semantics) so the train step
compiles exactly once — ragged tails would retrace.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["BatchLoader"]


class BatchLoader:
    """Shuffling, prefetching loader over an ``ImageFolder``-style dataset.

    Iterating yields dicts of stacked numpy arrays of identical shape every
    step.  Deterministic given ``seed`` (per-sample rngs are derived from
    (seed, epoch, index)).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        shuffle: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _sample(self, epoch: int, idx: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx])
        )
        return self.dataset[(idx, rng)]

    def __iter__(self):
        epoch = self.epoch
        self.epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).shuffle(order)

        n_batches = len(self)
        if n_batches == 0:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that re-checks the stop flag so an abandoned
            # iterator (consumer broke out early) never strands the thread
            # on a full queue.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    futs = [pool.submit(self._sample, epoch, int(i)) for i in idxs]
                    samples = [f.result() for f in futs]
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                    if not _put(batch):
                        return
            _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
