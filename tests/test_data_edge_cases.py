"""Edge cases: non-RGB inputs, mismatched pairs, uint8 tiled output."""

import numpy as np
import pytest

from ultrazoom_tpu.data import ImagePairs


def test_image_pairs_rejects_mismatched_counts(tmp_path):
    from PIL import Image

    (tmp_path / "lr").mkdir()
    (tmp_path / "hr").mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).save(
        tmp_path / "lr" / "a.png"
    )
    for n in ("a", "b"):
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(
            tmp_path / "hr" / f"{n}.png"
        )
    with pytest.raises(AssertionError, match="counts differ"):
        ImagePairs(tmp_path / "lr", tmp_path / "hr")


def test_grayscale_and_rgba_images_convert(tmp_path):
    from PIL import Image

    from ultrazoom_tpu.data import ImageFolder

    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 256, (40, 40), dtype=np.uint8), "L"
    ).save(tmp_path / "gray.png")
    Image.fromarray(
        rng.integers(0, 256, (40, 40, 4), dtype=np.uint8), "RGBA"
    ).save(tmp_path / "rgba.png")
    ds = ImageFolder(tmp_path, target_resolution=32, upscale_ratio=2)
    for i in range(len(ds)):
        s = ds[(i, np.random.default_rng(i))]
        assert s["x"].shape == (16, 16, 3)
        assert s["y"].shape == (32, 32, 3)


def test_tiled_uint8_output():
    import jax

    from ultrazoom_tpu.engine import TiledUpscaler
    from ultrazoom_tpu.ops import upsample2d

    eng = TiledUpscaler(
        lambda x: upsample2d(x, 2), 2, tile=16, overlap=4, output_dtype="uint8"
    )
    img = np.random.default_rng(2).uniform(0, 1, (20, 28, 3)).astype(np.float32)
    out = eng(img)
    assert out.dtype == np.uint8 and out.shape == (40, 56, 3)
    # quantisation only (clip+round), content preserved
    ref = np.asarray(upsample2d(np.asarray(img)[None], 2))[0]
    ref_u8 = np.round(np.clip(ref, 0, 1) * 255).astype(np.uint8)
    inner = np.abs(out[8:-8, 8:-8].astype(int) - ref_u8[8:-8, 8:-8].astype(int))
    assert inner.max() <= 1
