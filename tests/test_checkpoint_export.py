"""Tests: train-state checkpointing, StableHLO export, bf16 fidelity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ultrazoom_tpu.export.stablehlo import export_stablehlo, load_stablehlo, parity_check
from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.models import ctrl, unet
from ultrazoom_tpu.train import TrainState, make_optimizer, make_pretrain_step
from ultrazoom_tpu.utils import latest_meta, restore_state, save_state

TINY_CFG = unet.MewZoomConfig(
    upscale_ratio=2,
    primary_channels=8,
    primary_layers=2,
    secondary_channels=12,
    secondary_layers=2,
    tertiary_channels=16,
    tertiary_layers=2,
    quaternary_channels=24,
    quaternary_layers=2,
)


def _state(seed=0):
    params = unet.init(jax.random.key(seed), TINY_CFG)
    opt = make_optimizer(1e-3, 1.0)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)), opt


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    state, opt = _state()
    vgg = init_vgg19_features(seed=0)
    step = jax.jit(make_pretrain_step(TINY_CFG, opt, vgg))
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32),
        "y": jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32),
        "y_deg": jnp.asarray(rng.uniform(0, 1, (2, 3)), jnp.float32),
    }
    state, _ = step(state, batch)

    save_state(tmp_path / "ck", state, {"epoch": 3, "upscaler_args": TINY_CFG.to_dict()})
    meta = latest_meta(tmp_path / "ck")
    assert meta["epoch"] == 3

    fresh, _ = _state(seed=99)  # different values, same structure
    restored, meta2 = restore_state(tmp_path / "ck", fresh)
    assert meta2["epoch"] == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # Resumed training continues bit-identically.
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=0)


def test_stablehlo_export_roundtrip(tmp_path):
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)

    def fn(x, c):
        return ctrl.upscale(params, x, c, cfg=cfg)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    c = jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32)

    export_stablehlo(tmp_path / "model.stablehlo", fn, (x, c))
    loaded = load_stablehlo(tmp_path / "model.stablehlo")
    parity_check(fn, loaded, (x, c))  # reference ONNX-gate tolerances


@pytest.mark.slow
def test_bf16_compute_meets_fidelity_target():
    """bf16 inference must stay >=40 dB PSNR vs the f32 path (the
    BASELINE.json fidelity budget is vs the torch f32 reference; f32 parity
    is already ~1e-5, so bf16-vs-f32 bounds bf16-vs-torch)."""
    cfg = ctrl.PRESETS["2x"]
    params = ctrl.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    c = jnp.asarray([[0.3, 0.3, 0.3]], jnp.float32)
    y32 = np.asarray(ctrl.upscale(params, x, c, cfg=cfg))
    y16 = np.asarray(ctrl.upscale(params, x, c, cfg=cfg, compute_dtype=jnp.bfloat16))
    mse = float(np.mean((y32 - y16) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 40.0, psnr


@pytest.mark.slow
def test_bf16_unet_fidelity():
    params = unet.init(jax.random.key(1), TINY_CFG)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    y32, _ = unet.apply(params, x, TINY_CFG)
    y16, _ = unet.apply(params, x, TINY_CFG, compute_dtype=jnp.bfloat16)
    mse = float(np.mean((np.asarray(y32) - np.asarray(y16)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 40.0, psnr
