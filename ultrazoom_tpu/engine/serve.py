"""Production serving layer: cross-request dynamic tile batching.

The reference's deployment story stops at "export ONNX and run it"
(README.md:131-222) — one request, one graph execution.  On TPU the
economics differ: the chip wants large fixed-shape batches, and requests
arrive at arbitrary sizes and times.  This service bridges the two:

* every submitted image is decomposed into fixed-shape overlap tiles
  (engine/tiling.py — the same geometry as the batch engine);
* tile jobs from ALL in-flight requests share one queue; a worker drains
  up to ``tile_batch`` tiles per device step, so concurrent small requests
  ride the same MXU batch (dynamic batching);
* a partial batch is padded and dispatched anyway once ``max_wait_ms``
  expires, bounding tail latency;
* when a request's tiles are all done, its SR image is stitched and its
  Future resolves.

Thread-safe; pure host-side orchestration around ONE compiled graph (no
recompiles ever, any image size).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutureTimeoutError
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.engine.ensemble import make_self_ensemble
from ultrazoom_tpu.engine.tiling import (
    TilePlan,
    extract_tiles,
    plan_tiles,
    stitch_cores,
)

__all__ = ["UpscaleService"]


@dataclass(eq=False)  # identity semantics: requests live in the outstanding set
class _Request:
    plan: TilePlan
    future: Future
    cores: list  # per-tile SR cores, filled as they complete
    remaining: int
    lock: threading.Lock = field(default_factory=threading.Lock)


class UpscaleService:
    """Dynamic-batching SR service over one fixed-shape compiled graph.

    Args:
        upscale_fn: ``f(x: (B, tile, tile, 3)) -> SR`` (same contract as
            TiledUpscaler; typically ``partial(model.upscale, ...)``).
        scale, tile, overlap: overlap-tile geometry.
        tile_batch: tiles per device step (the compiled batch).
        max_wait_ms: dispatch a padded partial batch after this long.
        call_timeout_s: deadline on ONE device step.  The tunnel-attached
            backend can wedge an in-flight RPC (same failure family as
            train/watchdog.py / bench.py): without a deadline the single
            worker thread blocks forever and every pending Future hangs.
            On breach the service fails ALL outstanding futures with
            RuntimeError and refuses new submits — callers unblock and
            rebuild the service (a fresh process/service is the observed
            cure; the stuck call itself cannot be cancelled in-process,
            so the wedged call is abandoned on its helper thread).
            None (default) disables the deadline; the device call then
            runs inline on the worker thread with no extra hop.

    Failure semantics: ANY exception escaping the device step or the
    stitcher — not just a deadline breach — fails every outstanding
    future with that error and closes the service.  The compiled graph
    is shared by all requests, so a device-side failure is not
    recoverable per-batch; stranding futures (the pre-round-4 behavior)
    is never an option.

    ``core_sink=True`` is a BENCHMARK-ONLY mode: the full SR compute and
    core crop run on device, but each tile reduces to one scalar (mean)
    before readback, and a request's future resolves to the (num_tiles,)
    scalar vector instead of the stitched image.  This isolates
    engine + compute throughput from output D2H — on a tunnel-attached
    dev chip the D2H link (~40 MB/s) otherwise dominates any large-output
    measurement (tools/bench_suite.py compute-only scenarios).
    """

    def __init__(
        self,
        upscale_fn: Callable,
        scale: int,
        tile: int = 256,
        overlap: int = 16,
        tile_batch: int = 8,
        max_wait_ms: float = 5.0,
        output_dtype: str = "float32",
        call_timeout_s: float | None = None,
        core_sink: bool = False,
        self_ensemble: bool = False,
    ):
        if self_ensemble:
            # x8 geometric TTA per tile (engine/ensemble.py): one 8x-batch
            # model call inside the same compiled step.
            upscale_fn = make_self_ensemble(upscale_fn)
        assert output_dtype in ("float32", "uint8")
        self.scale = scale
        self.tile = tile
        self.overlap = overlap
        self.tile_batch = tile_batch
        self.max_wait = max_wait_ms / 1e3
        self._core_sink = core_sink

        ovs = overlap * scale
        cores = (tile - 2 * overlap) * scale

        def wrapped(x):
            y = upscale_fn(x)
            y = y[:, ovs : ovs + cores, ovs : ovs + cores, :]
            if output_dtype == "uint8":
                # Quantise on device: 4x less D2H (see engine/infer.py).
                y = jnp.round(jnp.clip(y.astype(jnp.float32), 0, 1) * 255.0)
                y = y.astype(jnp.uint8)
            if core_sink:
                # Benchmark mode: one scalar per tile leaves the device.
                y = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
            return y

        self._fn = jax.jit(wrapped)
        self._call_timeout = call_timeout_s
        self._jobs: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        self._failure: Exception | None = None  # set once, before _closed
        self._outstanding: set[_Request] = set()
        self._outstanding_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "tiles": 0, "batches": 0, "padded_slots": 0}
        # The deadline runs the device call on this single helper thread so
        # the worker can give up waiting; a wedged RPC parks here forever
        # (daemon=True: it dies with the process, the only possible cleanup).
        self._device_pool = (
            ThreadPoolExecutor(max_workers=1, thread_name_prefix="upscale-device")
            if call_timeout_s is not None
            else None
        )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- public API ----------------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue an (H, W, 3) float [0,1] image; resolves to (H*s, W*s, 3).

        Raises RuntimeError if the service is closed — including after a
        worker failure or deadline breach (the original cause is chained).
        """
        if self._closed.is_set():
            raise RuntimeError("UpscaleService is closed") from self._failure
        img = np.asarray(image)
        if img.ndim != 3:
            raise ValueError(f"submit one HWC image per call, got shape {img.shape}")
        plan = plan_tiles(img.shape, self.scale, self.tile, self.overlap)
        tiles = extract_tiles(img, plan)
        req = _Request(
            plan=plan,
            future=Future(),
            cores=[None] * plan.num_tiles,
            remaining=plan.num_tiles,
        )
        with self._outstanding_lock:
            # Re-check under the lock: a concurrent failure between the top
            # check and here must not enqueue work the dead worker won't run.
            if self._closed.is_set():
                raise RuntimeError("UpscaleService is closed") from self._failure
            self._outstanding.add(req)
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["tiles"] += plan.num_tiles
        for k in range(plan.num_tiles):
            self._jobs.put((req, k, tiles[k]))
        return req.future

    def upscale(self, image: np.ndarray) -> np.ndarray:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(image).result()

    def stats(self) -> dict:
        with self._stats_lock:
            return dict(self._stats)

    def close(self) -> None:
        self._closed.set()
        self._worker.join(timeout=10)
        if self._device_pool is not None:
            # Never wait: a wedged device call would block forever.
            self._device_pool.shutdown(wait=False)

    # -- worker --------------------------------------------------------------

    def _collect_batch(self):
        """Block for the first job, then fill the batch until full or
        ``max_wait`` elapses."""
        try:
            first = self._jobs.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.tile_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                batch.append(self._jobs.get(timeout=timeout))
            except queue.Empty:
                break
        return batch

    def _device_call(self, x: np.ndarray) -> np.ndarray:
        """One device step, under the configured deadline (if any)."""
        if self._device_pool is None:
            return np.asarray(self._fn(jnp.asarray(x)))
        fut = self._device_pool.submit(lambda: np.asarray(self._fn(jnp.asarray(x))))
        try:
            return fut.result(timeout=self._call_timeout)
        except FutureTimeoutError:
            # The call cannot be cancelled; abandon it on the helper thread.
            raise RuntimeError(
                f"device step exceeded call_timeout_s={self._call_timeout}: "
                "backend wedged — rebuild the service in a fresh process"
            ) from None

    def _fail_all(self, exc: Exception) -> None:
        """Fail every outstanding future, close the service, drain the queue."""
        self._failure = exc
        with self._outstanding_lock:
            self._closed.set()  # under the lock: fences concurrent submits
            pending = list(self._outstanding)
            self._outstanding.clear()
        for req in pending:
            if not req.future.done():
                req.future.set_exception(exc)
        try:
            while True:
                self._jobs.get_nowait()
        except queue.Empty:
            pass

    def _run(self):
        c = 3
        while not (self._closed.is_set() and self._jobs.empty()):
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                n = len(batch)
                x = np.zeros((self.tile_batch, self.tile, self.tile, c), np.float32)
                for i, (_, _, t) in enumerate(batch):
                    x[i] = t
                out = self._device_call(x)
                with self._stats_lock:
                    self._stats["batches"] += 1
                    self._stats["padded_slots"] += self.tile_batch - n
                for i, (req, k, _) in enumerate(batch):
                    with req.lock:
                        req.cores[k] = out[i]
                        req.remaining -= 1
                        done = req.remaining == 0
                    if done:
                        if self._core_sink:
                            result = np.stack(req.cores)  # (num_tiles,) scalars
                        else:
                            result = stitch_cores(np.stack(req.cores), req.plan)
                        with self._outstanding_lock:
                            self._outstanding.discard(req)
                        # A bare Future can be cancel()ed by its holder at any
                        # time before set_result; that must not escalate into a
                        # service-wide failure via InvalidStateError below.
                        if not req.future.cancelled():
                            req.future.set_result(result)
            except Exception as exc:  # noqa: BLE001 — anything → fail, never strand
                self._fail_all(exc)
                return
