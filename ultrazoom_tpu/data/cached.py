"""Offline sample cache: pre-degraded (LR, HR, label) triples as memmaps.

The live pipeline (``ImageFolder`` + ``BatchLoader``) decodes, augments,
degrades and JPEG-round-trips every sample on the host per step.  The
reference does the same with 8 DataLoader worker processes
(pretrain.py:164-172); on a host with few cores that pipeline cannot keep a
TPU fed (measured: 21 imgs/s on this 1-core host vs ~213 imgs/s consumed by
the 56M U-Net step).  The chain is *exactly reproducible offline*: every
stage ends in uint8 (JPEG decode is the last degradation, augment rounds
back to uint8), so caching uint8 arrays is lossless — bit-identical to the
live pipeline, not an approximation.

``build_sample_cache`` materialises ``num_variants`` degraded variants per
source image using the same per-sample rng derivation as ``BatchLoader``
(``SeedSequence([seed, epoch, idx])``): variant block ``v`` of the cache is
bit-identical to live epoch ``v``.  ``CachedImageFolder`` then serves
samples from the memmaps at memory bandwidth, through the same
``dataset[(idx, rng)]`` protocol ``BatchLoader`` expects.

Layout of a cache directory::

    cache_meta.json   {n_images, num_variants, seed, shapes, ...}
    x.npy             (N, lh, lw, 3) uint8   degraded LR
    y.npy             (N, th, tw, 3) uint8   HR target
    y_deg.npy         (N, 3) float32         normalised degradation labels

where ``N = n_images * num_variants`` and sample ``v * n_images + i`` is
variant ``v`` of image ``i``.
"""

from __future__ import annotations

import json
import pathlib
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["build_sample_cache", "CachedImageFolder", "is_sample_cache"]

_META = "cache_meta.json"


def is_sample_cache(path) -> bool:
    """True if ``path`` is a directory produced by ``build_sample_cache``."""
    return (pathlib.Path(path) / _META).is_file()


def build_sample_cache(
    dataset,
    out_dir,
    num_variants: int = 1,
    seed: int = 0,
    num_workers: int = 8,
    progress: bool = False,
) -> dict:
    """Materialise ``num_variants`` epochs of ``dataset`` into ``out_dir``.

    ``dataset`` is any ``ImageFolder``-style object (``__len__`` plus
    ``__getitem__((idx, rng)) -> {"x", "y", "y_deg"}``).  The rng for
    variant ``v`` of image ``i`` is ``SeedSequence([seed, v, i])`` — the
    derivation ``BatchLoader`` uses for epoch ``v``, sample ``i`` — so a
    cache-backed run with the same seed sees bit-identical data to a live
    run for its first ``num_variants`` epochs (and reshuffles of the same
    samples after).
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_images = len(dataset)
    n_total = n_images * num_variants

    first = dataset[(0, np.random.default_rng(np.random.SeedSequence([seed, 0, 0])))]
    lh, lw, _ = first["x"].shape
    th, tw, _ = first["y"].shape

    x_mm = np.lib.format.open_memmap(
        out / "x.npy", mode="w+", dtype=np.uint8, shape=(n_total, lh, lw, 3)
    )
    y_mm = np.lib.format.open_memmap(
        out / "y.npy", mode="w+", dtype=np.uint8, shape=(n_total, th, tw, 3)
    )
    d_mm = np.lib.format.open_memmap(
        out / "y_deg.npy", mode="w+", dtype=np.float32, shape=(n_total, 3)
    )

    def _one(flat: int) -> None:
        v, i = divmod(flat, n_images)
        rng = np.random.default_rng(np.random.SeedSequence([seed, v, i]))
        s = dataset[(i, rng)]
        # x and y are exactly uint8/255 (JPEG decode / augment rounding are
        # the last stages), so the round-trip is lossless.
        x_mm[flat] = np.round(s["x"] * 255.0).astype(np.uint8)
        y_mm[flat] = np.round(s["y"] * 255.0).astype(np.uint8)
        d_mm[flat] = s["y_deg"]

    with ThreadPoolExecutor(max(1, num_workers)) as pool:
        for k, _ in enumerate(pool.map(_one, range(n_total))):
            if progress and (k + 1) % 500 == 0:
                print(f"  cached {k + 1}/{n_total} samples", flush=True)
    for mm in (x_mm, y_mm, d_mm):
        mm.flush()

    meta = {
        "n_images": n_images,
        "num_variants": num_variants,
        "seed": seed,
        "lr_shape": [lh, lw, 3],
        "hr_shape": [th, tw, 3],
        "n_samples": n_total,
    }
    # Record the generating data config so trainers can verify a detected
    # cache actually matches their CLI flags (a cache built with different
    # degradation ranges would silently yield y_deg labels normalised to
    # the wrong scale; different resolutions fail late with an opaque
    # shape error inside the jitted step).
    if hasattr(dataset, "deg_cfg"):
        import dataclasses

        meta["target_resolution"] = int(dataset.target)
        meta["upscale_ratio"] = int(dataset.ratio)
        meta["degradation"] = dataclasses.asdict(dataset.deg_cfg)
        meta["augmentation"] = dataclasses.asdict(dataset.aug_cfg)
    (out / _META).write_text(json.dumps(meta, indent=1))
    return meta


def assert_cache_matches(
    meta: dict,
    target_resolution: int,
    upscale_ratio: int,
    deg_cfg=None,
    aug_cfg=None,
) -> None:
    """Fail fast if a detected sample cache was built with a different data
    config than the trainer's CLI flags.  Caches from before the config was
    recorded (no ``upscale_ratio`` key) are skipped with a warning."""
    import dataclasses
    import warnings

    if "upscale_ratio" not in meta:
        warnings.warn(
            "sample cache has no recorded data config (built by an older "
            "cache_dataset); cannot verify it matches the trainer flags",
            stacklevel=2,
        )
        return
    problems = []
    if meta["target_resolution"] != target_resolution:
        problems.append(
            f"target_resolution: cache {meta['target_resolution']} vs "
            f"flags {target_resolution}"
        )
    if meta["upscale_ratio"] != upscale_ratio:
        problems.append(
            f"upscale_ratio: cache {meta['upscale_ratio']} vs flags {upscale_ratio}"
        )
    for name, cfg in (("degradation", deg_cfg), ("augmentation", aug_cfg)):
        if cfg is None or name not in meta:
            continue
        want = dataclasses.asdict(cfg)
        if meta[name] != want:
            diffs = {
                k: (meta[name].get(k), want[k])
                for k in want
                if meta[name].get(k) != want[k]
            }
            problems.append(f"{name} (cache vs flags): {diffs}")
    if problems:
        raise ValueError(
            "Sample cache was built with a different data config than the "
            "trainer flags — rebuild it with tools/cache_dataset.py or fix "
            "the flags:\n  " + "\n  ".join(problems)
        )


class CachedImageFolder:
    """Serve pre-degraded samples from a ``build_sample_cache`` directory.

    Implements the ``dataset[(idx, rng)]`` protocol of ``ImageFolder`` (the
    rng is ignored — randomness was consumed at cache-build time), so it
    drops into ``BatchLoader`` unchanged.

    By default images are returned as **uint8** (``dtype="uint8"``): the
    train/eval steps normalise on device (``train.steps.as_float01``),
    which cuts host->device batch traffic 4x with bit-identical numerics
    (f32(u8)/255 commutes across the transfer).  Pass ``dtype="float32"``
    for the live-``ImageFolder``-compatible float contract.
    """

    def __init__(self, cache_dir, dtype: str = "uint8", max_samples: int | None = None):
        assert dtype in ("uint8", "float32")
        self.root = pathlib.Path(cache_dir)
        self.dtype = dtype
        self.meta = json.loads((self.root / _META).read_text())
        self._x = np.load(self.root / "x.npy", mmap_mode="r")
        self._y = np.load(self.root / "y.npy", mmap_mode="r")
        self._deg = np.load(self.root / "y_deg.npy", mmap_mode="r")
        assert self._x.shape[0] == self._y.shape[0] == self._deg.shape[0]
        if max_samples is not None and max_samples < self._x.shape[0]:
            # Caches are variant-major (build_sample_cache: flat = v *
            # n_images + i), so a head slice of >= n_images keeps every
            # source image and drops (possibly partial) degradation
            # variants — the right subset when the full cache would not fit
            # the device-data HBM budget.  A cap below n_images silently
            # loses source images, which is almost never intended — warn.
            n_images = int(self.meta.get("n_images", 0))
            if 0 < max_samples < n_images:
                import warnings

                warnings.warn(
                    f"max_samples={max_samples} is below the cache's "
                    f"n_images={n_images}: {n_images - max_samples} source "
                    "images will never be seen. Caches are variant-major; "
                    "use max_samples >= n_images to keep full image "
                    "coverage.",
                    stacklevel=2,
                )
            self._x = self._x[:max_samples]
            self._y = self._y[:max_samples]
            self._deg = self._deg[:max_samples]

    def __len__(self) -> int:
        return int(self._x.shape[0])

    def __getitem__(self, idx_and_rng) -> dict[str, np.ndarray]:
        idx = idx_and_rng[0] if isinstance(idx_and_rng, tuple) else idx_and_rng
        if self.dtype == "uint8":
            x = np.asarray(self._x[idx])
            y = np.asarray(self._y[idx])
        else:
            x = self._x[idx].astype(np.float32) / 255.0
            y = self._y[idx].astype(np.float32) / 255.0
        return {
            "x": x,
            "y": y,
            "y_deg": np.asarray(self._deg[idx], np.float32),
        }
