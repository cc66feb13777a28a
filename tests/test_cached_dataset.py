"""Offline sample cache: bit-exactness vs the live pipeline + trainer integration.

The cache's contract is strong: variant block v of the cache is
bit-identical to live epoch v under BatchLoader's rng derivation
(SeedSequence([seed, epoch, idx])), because every pipeline stage ends in
uint8 (JPEG decode last, augment rounds back to uint8).
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    for i in range(3):
        base = rng.uniform(0, 1, (5, 5, 3))
        img = np.kron(base, np.ones((8, 8, 1)))[:36, :36]
        Image.fromarray((img * 255).astype(np.uint8)).save(root / f"{i}.png")
    return root


@pytest.fixture(scope="module")
def live_ds(image_dir):
    from ultrazoom_tpu.data import AugmentConfig, DegradationConfig, ImageFolder

    return ImageFolder(
        str(image_dir), target_resolution=32, upscale_ratio=2,
        degradation=DegradationConfig(),
        augmentation=AugmentConfig(32),
    )


def test_cache_is_bit_identical_to_live_pipeline(live_ds, tmp_path):
    from ultrazoom_tpu.data import CachedImageFolder, build_sample_cache

    seed, variants = 123, 2
    meta = build_sample_cache(
        live_ds, tmp_path / "c", num_variants=variants, seed=seed, num_workers=2
    )
    assert meta["n_samples"] == len(live_ds) * variants

    cached = CachedImageFolder(tmp_path / "c")
    assert len(cached) == meta["n_samples"]
    for v in range(variants):
        for i in range(len(live_ds)):
            rng = np.random.default_rng(np.random.SeedSequence([seed, v, i]))
            live = live_ds[(i, rng)]
            got = cached[(v * len(live_ds) + i, None)]
            for k in ("x", "y", "y_deg"):
                np.testing.assert_array_equal(
                    got[k], live[k], err_msg=f"variant {v} image {i} key {k}"
                )


def test_cache_detection_and_loader(live_ds, tmp_path):
    from ultrazoom_tpu.data import (
        BatchLoader,
        CachedImageFolder,
        build_sample_cache,
        is_sample_cache,
    )

    assert not is_sample_cache(tmp_path)
    build_sample_cache(live_ds, tmp_path / "c", num_variants=2, seed=0)
    assert is_sample_cache(tmp_path / "c")

    loader = BatchLoader(CachedImageFolder(tmp_path / "c"), batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3  # 6 samples / 2
    b = batches[0]
    assert b["x"].shape == (2, 16, 16, 3) and b["x"].dtype == np.float32
    assert b["y"].shape == (2, 32, 32, 3)
    assert b["y_deg"].shape == (2, 3)
    assert 0.0 <= b["x"].min() and b["x"].max() <= 1.0


def test_pretrain_cli_over_cache(image_dir, tmp_path):
    """The pretrain CLI auto-detects a cache dir passed as the images path."""
    from ultrazoom_tpu.tools.cache_dataset import main as cache_main
    from ultrazoom_tpu.train.pretrain import main as pt_main

    cache_main([
        "--images_path", str(image_dir),
        "--out", str(tmp_path / "trainc"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--num_variants", "3", "--num_dataset_processes", "2",
    ])
    cache_main([
        "--images_path", str(image_dir),
        "--out", str(tmp_path / "testc"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--eval", "--num_dataset_processes", "2",
    ])

    ckpt = tmp_path / "ck"
    pt_main([
        "--train_images_path", str(tmp_path / "trainc"),
        "--test_images_path", str(tmp_path / "testc"),
        "--arch", "ctrl", "--num_channels", "8", "--num_encoder_layers", "2",
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "2", "--eval_interval", "2",
        "--checkpoint_interval", "2",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(tmp_path / "runs"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 2
