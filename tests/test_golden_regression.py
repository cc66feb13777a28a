"""Golden numeric regression: fixed seed + fixed input -> pinned output
statistics.  Catches silent numeric drift in ops/model/converter across
refactors (the reference has no such guard; its only numeric gate is the
ONNX export check)."""

import numpy as np
import jax
import jax.numpy as jnp

from ultrazoom_tpu.models import ctrl, unet

# Pinned on first implementation (f32, HIGHEST matmul precision, CPU).
GOLDEN_UNET = dict(mean=0.51952934, std=0.25362083, corner=1.00000000)
GOLDEN_CTRL = dict(mean=0.53142101, std=0.35560176, corner=0.85763884)


def _fixed_image():
    rng = np.random.default_rng(1234)
    return jnp.asarray(rng.uniform(0, 1, (1, 24, 24, 3)), jnp.float32)


def test_unet_golden():
    cfg = unet.MewZoomConfig(
        upscale_ratio=2,
        primary_channels=8, primary_layers=2,
        secondary_channels=12, secondary_layers=2,
        tertiary_channels=16, tertiary_layers=2,
        quaternary_channels=24, quaternary_layers=2,
    )
    params = unet.init(jax.random.key(42), cfg)
    out = np.asarray(unet.upscale(params, _fixed_image(), cfg))
    got = dict(
        mean=float(out.mean()), std=float(out.std()), corner=float(out[0, 0, 0, 0])
    )
    for k, v in GOLDEN_UNET.items():
        assert abs(got[k] - v) < 1e-5, (k, got[k], v)


def test_ctrl_golden():
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=3, num_channels=8, num_layers=3)
    params = ctrl.init(jax.random.key(42), cfg)
    c = jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32)
    out = np.asarray(ctrl.upscale(params, _fixed_image(), c, cfg=cfg))
    got = dict(
        mean=float(out.mean()), std=float(out.std()), corner=float(out[0, 0, 0, 0])
    )
    for k, v in GOLDEN_CTRL.items():
        assert abs(got[k] - v) < 1e-5, (k, got[k], v)
