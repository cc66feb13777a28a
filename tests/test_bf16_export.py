"""bfloat16 HF exports: half-size artifacts that round-trip through
from_pretrained transparently (load upcasts to f32)."""

import numpy as np


def test_bf16_export_roundtrip_ctrl(tmp_path):
    from ultrazoom_tpu.models.api import MewZoomCtrl

    m = MewZoomCtrl.from_config(upscale_ratio=2, num_channels=8, num_layers=2)
    m.save_pretrained(tmp_path / "f32")
    m.save_pretrained(tmp_path / "bf16", dtype="bfloat16")

    s32 = (tmp_path / "f32" / "model.safetensors").stat().st_size
    s16 = (tmp_path / "bf16" / "model.safetensors").stat().st_size
    assert s16 < 0.6 * s32, (s16, s32)

    m16 = MewZoomCtrl.from_pretrained(tmp_path / "bf16")
    leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(m16.params)]
    assert all(a.dtype == np.float32 for a in leaves)

    x = np.random.default_rng(0).uniform(0, 1, (1, 12, 12, 3)).astype(np.float32)
    want = np.asarray(m.upscale(x))
    got = np.asarray(m16.upscale(x))
    psnr = -10 * np.log10(np.mean((want - got) ** 2) + 1e-12)
    assert psnr > 40, psnr  # bf16 quantisation only


def test_bf16_export_roundtrip_unet(tmp_path):
    from ultrazoom_tpu.models import unet
    from ultrazoom_tpu.models.api import MewZoom

    cfg = unet.MewZoomConfig(
        upscale_ratio=2,
        primary_channels=8, primary_layers=2,
        secondary_channels=12, secondary_layers=2,
        tertiary_channels=16, tertiary_layers=2,
        quaternary_channels=24, quaternary_layers=2,
    )
    m = MewZoom.from_config(cfg)
    m.save_pretrained(tmp_path / "bf16", dtype="bfloat16")
    m16 = MewZoom.from_pretrained(tmp_path / "bf16")
    x = np.random.default_rng(1).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    want = np.asarray(m.upscale(x))
    got = np.asarray(m16.upscale(x))
    psnr = -10 * np.log10(np.mean((want - got) ** 2) + 1e-12)
    assert psnr > 40, psnr
