"""The plain `tools.upscale` CLI: file and directory modes, Ctrl and UNet."""

import numpy as np
import pytest
from PIL import Image

from ultrazoom_tpu.models import MewZoom, MewZoomCtrl
from ultrazoom_tpu.tools.upscale import main


@pytest.fixture(scope="module")
def ctrl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ctrl_model")
    MewZoomCtrl.from_config(
        MewZoomCtrl.Config(upscale_ratio=2, num_channels=8, num_layers=2), seed=0
    ).save_pretrained(d)
    return d


def _png(path, h, w, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(path)


def test_single_file(ctrl_dir, tmp_path):
    _png(tmp_path / "in.png", 16, 24)
    out = tmp_path / "out.png"
    main([
        "--model_path", str(ctrl_dir),
        "--image_path", str(tmp_path / "in.png"),
        "--output_path", str(out),
        "--gaussian_blur", "0.5",
        "--compute_dtype", "float32",
    ])
    assert Image.open(out).size == (48, 32)


def test_directory_mode_and_tiling(ctrl_dir, tmp_path):
    src = tmp_path / "frames"
    src.mkdir()
    for i, (h, w) in enumerate([(16, 16), (20, 24)]):
        _png(src / f"f{i}.png", h, w, seed=i)
    dst = tmp_path / "sr"
    main([
        "--model_path", str(ctrl_dir),
        "--image_path", str(src),
        "--output_path", str(dst),
        "--tile", "16",
        "--overlap", "4",
        "--compute_dtype", "float32",
    ])
    assert Image.open(dst / "f0_2x.png").size == (32, 32)
    assert Image.open(dst / "f1_2x.png").size == (48, 40)


def test_overlap_requires_tile(ctrl_dir, tmp_path):
    _png(tmp_path / "in.png", 16, 16)
    with pytest.raises(SystemExit):
        main([
            "--model_path", str(ctrl_dir),
            "--image_path", str(tmp_path / "in.png"),
            "--output_path", str(tmp_path / "out.png"),
            "--overlap", "4",
        ])


def test_unet_model(tmp_path):
    d = tmp_path / "unet"
    MewZoom.from_config(
        MewZoom.Config(
            upscale_ratio=2,
            primary_channels=8, primary_layers=2,
            secondary_channels=12, secondary_layers=2,
            tertiary_channels=16, tertiary_layers=2,
            quaternary_channels=24, quaternary_layers=2,
        ),
        seed=0,
    ).save_pretrained(d)
    _png(tmp_path / "in.png", 16, 16)
    out = tmp_path / "o.png"
    main([
        "--model_path", str(d),
        "--image_path", str(tmp_path / "in.png"),
        "--output_path", str(out),
        "--compute_dtype", "float32",
    ])
    assert Image.open(out).size == (32, 32)


def test_directory_batching_whole_image(ctrl_dir, tmp_path):
    # Same-size frames ride the batch axis; a size change flushes the group.
    src = tmp_path / "frames"
    src.mkdir()
    for i in range(3):
        _png(src / f"a{i}.png", 16, 16, seed=i)
    _png(src / "b0.png", 20, 16, seed=9)
    dst = tmp_path / "sr"
    main([
        "--model_path", str(ctrl_dir),
        "--image_path", str(src),
        "--output_path", str(dst),
        "--batch", "2",
        "--compute_dtype", "float32",
    ])
    for i in range(3):
        assert Image.open(dst / f"a{i}_2x.png").size == (32, 32)
    assert Image.open(dst / "b0_2x.png").size == (32, 40)
    # Batched output must equal the single-image path exactly.
    solo = tmp_path / "solo"
    main([
        "--model_path", str(ctrl_dir),
        "--image_path", str(src / "a1.png"),
        "--output_path", str(solo / "a1.png"),
        "--compute_dtype", "float32",
    ])
    batched = np.asarray(Image.open(dst / "a1_2x.png"))
    single = np.asarray(Image.open(solo / "a1.png"))
    np.testing.assert_array_equal(batched, single)
