"""Tests for the host-side data pipeline (degradations, datasets, loader)."""

import numpy as np
import pytest

from ultrazoom_tpu.data import (
    AugmentConfig,
    BatchLoader,
    DegradationConfig,
    ImageFolder,
    ImagePairs,
    augment,
    degrade,
)
from ultrazoom_tpu.data.degradations import gaussian_blur_u8, resize_u8


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 256, (48 + i, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.png")
    # One too-small image that must be filtered out.
    Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).save(
        root / "tiny.png"
    )
    return root


def test_gaussian_blur_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    sigma = 1.2
    ksize = 2 * int(3 * sigma) + 1

    # Independent torch-core computation with the same kernel convention.
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k1 = np.exp(-0.5 * (x / sigma) ** 2)
    k1 = (k1 / k1.sum()).astype(np.float32)
    t = torch.from_numpy(img.astype(np.float32).transpose(2, 0, 1))[None]
    pad = ksize // 2
    t = F.pad(t, (pad, pad, pad, pad), mode="reflect")
    kh = torch.from_numpy(k1)[None, None, :, None].repeat(3, 1, 1, 1)
    kw = torch.from_numpy(k1)[None, None, None, :].repeat(3, 1, 1, 1)
    t = F.conv2d(t, kh, groups=3)
    t = F.conv2d(t, kw, groups=3)
    ref = np.clip(np.round(t[0].numpy().transpose(1, 2, 0)), 0, 255).astype(np.uint8)

    got = gaussian_blur_u8(img, sigma)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1  # rounding ties


def test_blur_sigma_zero_is_noop():
    img = np.random.default_rng(2).integers(0, 256, (10, 10, 3), dtype=np.uint8)
    np.testing.assert_array_equal(gaussian_blur_u8(img, 0.0), img)


def test_resize_u8_shapes_and_range():
    img = np.random.default_rng(3).integers(0, 256, (64, 48, 3), dtype=np.uint8)
    for method in ("bicubic", "bilinear", "nearest"):
        out = resize_u8(img, (32, 24), method)
        assert out.shape == (32, 24, 3) and out.dtype == np.uint8


def test_degrade_output_contract():
    cfg = DegradationConfig()
    rng = np.random.default_rng(4)
    hr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    lr, y_deg = degrade(hr, (32, 32), cfg, rng)
    assert lr.shape == (32, 32, 3) and lr.dtype == np.float32
    assert 0.0 <= lr.min() and lr.max() <= 1.0
    assert y_deg.shape == (3,) and (0 <= y_deg).all() and (y_deg <= 1).all()


def test_degradation_config_validation():
    with pytest.raises(AssertionError):
        DegradationConfig(min_gaussian_blur=1.0, max_gaussian_blur=1.0)


def test_augment_contract():
    cfg = AugmentConfig(target_resolution=32)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    out = augment(img, cfg, rng)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_image_folder_filters_small_and_yields_batches(image_dir):
    with pytest.warns(UserWarning, match="smaller than target"):
        ds = ImageFolder(image_dir, target_resolution=32, upscale_ratio=2)
    assert len(ds) == 6  # tiny.png filtered

    loader = BatchLoader(ds, batch_size=2, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["x"].shape == (2, 16, 16, 3)
    assert b["y"].shape == (2, 32, 32, 3)
    assert b["y_deg"].shape == (2, 3)


def test_loader_deterministic_given_seed(image_dir):
    with pytest.warns(UserWarning):
        ds = ImageFolder(image_dir, target_resolution=32, upscale_ratio=2)
    a = next(iter(BatchLoader(ds, 2, seed=7)))
    b = next(iter(BatchLoader(ds, 2, seed=7)))
    np.testing.assert_array_equal(a["x"], b["x"])
    c = next(iter(BatchLoader(ds, 2, seed=8)))
    assert not np.array_equal(a["x"], c["x"])


def test_image_pairs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(6)
    (tmp_path / "lr").mkdir()
    (tmp_path / "hr").mkdir()
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        ).save(tmp_path / "lr" / f"{i}.png")
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        ).save(tmp_path / "hr" / f"{i}.png")
    ds = ImagePairs(tmp_path / "lr", tmp_path / "hr")
    assert len(ds) == 3
    pair = ds[0]
    assert pair["x"].shape == (16, 16, 3) and pair["y"].shape == (32, 32, 3)
