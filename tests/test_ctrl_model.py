"""Tests for the MewZoomCtrl reconstruction (flat controllable body)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ultrazoom_tpu.models import ctrl
from ultrazoom_tpu.models.api import MewZoomCtrl

TINY = ctrl.MewZoomCtrlConfig(upscale_ratio=3, num_channels=8, num_layers=3)


def _params(cfg=TINY, seed=0):
    return ctrl.init(jax.random.key(seed), cfg)


@pytest.mark.parametrize("ratio", [2, 3, 4])
def test_output_shape(ratio):
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=ratio, num_channels=8, num_layers=2)
    p = _params(cfg)
    x = jnp.ones((2, 10, 14, 3), jnp.float32) * 0.5
    y = ctrl.apply(p, x, jnp.zeros((2, 3)), cfg=cfg)
    assert y.shape == (2, 10 * ratio, 14 * ratio, 3)


def test_control_vector_changes_output():
    p = _params()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 12, 12, 3)), jnp.float32)
    y0 = ctrl.apply(p, x, jnp.zeros((1, 3)), cfg=TINY)
    y1 = ctrl.apply(p, x, jnp.ones((1, 3)), cfg=TINY)
    assert float(jnp.abs(y0 - y1).max()) > 1e-6


def test_non_controllable_has_no_film_params():
    cfg = ctrl.MewZoomCtrlConfig(
        upscale_ratio=2, num_channels=8, num_layers=2, controllable=False
    )
    p = _params(cfg)
    assert "film_w" not in p["body"]
    x = jnp.ones((1, 8, 8, 3), jnp.float32) * 0.3
    y = ctrl.apply(p, x, None, cfg=cfg)
    assert y.shape == (1, 16, 16, 3)


@pytest.mark.parametrize(
    "preset,expected_millions",
    [("2x", 1.8), ("3x", 3.5), ("4x", 14.0)],
)
@pytest.mark.slow
def test_preset_param_counts_match_readme(preset, expected_millions):
    """README.md:35-42 publishes 1.8M / 3.5M / 14M for 2X/3X/4X."""
    model = MewZoomCtrl.from_preset(preset)
    millions = model.num_params / 1e6
    assert abs(millions - expected_millions) / expected_millions < 0.10, millions


def test_control_vector_validation_and_tensor():
    cv = ctrl.ControlVector(0.5, 0.2, 0.3)
    t = cv.to_tensor()
    np.testing.assert_allclose(np.asarray(t), [[0.5, 0.2, 0.3]])
    with pytest.raises(AssertionError):
        ctrl.ControlVector(gaussian_blur=1.5)


@pytest.mark.slow
def test_film_matches_torch_semantics():
    """Golden check of one Ctrl block against an equivalent torch-core graph."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=4, num_layers=2)
    p = _params(cfg, seed=1)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 6, 6, 3)).astype(np.float32)
    c = np.asarray([[0.3, 0.6, 0.9]], np.float32)

    # torch re-implementation of the same graph from the same weights.
    def oihw(w):
        return torch.from_numpy(np.transpose(np.asarray(w), (3, 2, 0, 1)).copy())

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    ct = torch.from_numpy(c)
    st = F.interpolate(xt, scale_factor=2, mode="bicubic")
    z = F.conv2d(xt, oihw(p["stem"]["conv"]["weight"]),
                 torch.from_numpy(np.asarray(p["stem"]["conv"]["bias"])))
    for i in range(cfg.num_layers):
        h = F.conv2d(z, oihw(p["body"]["conv1"]["weight"][i]), padding=1)
        gb = ct @ torch.from_numpy(np.asarray(p["body"]["film_w"][i])) + torch.from_numpy(
            np.asarray(p["body"]["film_b"][i])
        )
        gamma, beta = gb.chunk(2, dim=-1)
        h = h * (1 + gamma[:, :, None, None]) + beta[:, :, None, None]
        h = F.silu(h)
        h = F.conv2d(h, oihw(p["body"]["conv2"]["weight"][i]), padding=1)
        z = z + h
    z = F.conv2d(z, oihw(p["tail"]["conv"]["weight"]), padding=1)
    z = F.pixel_shuffle(z, 2)
    ref = (st + z).numpy()

    got = ctrl.apply(p, jnp.asarray(x), jnp.asarray(c), cfg=cfg)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_save_load_roundtrip(tmp_path):
    model = MewZoomCtrl.from_config(TINY, seed=2)
    x = np.random.default_rng(2).uniform(0, 1, (1, 9, 9, 3)).astype(np.float32)
    c = ctrl.ControlVector(0.5, 0.5, 0.5)
    y0 = model.upscale(x, c)

    model.save_pretrained(tmp_path / "ckpt")
    loaded = MewZoomCtrl.from_pretrained(tmp_path / "ckpt")
    y1 = loaded.upscale(x, c)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_test_compare_returns_pair():
    model = MewZoomCtrl.from_config(TINY, seed=3)
    x = np.random.default_rng(3).uniform(0, 1, (9, 9, 3)).astype(np.float32)
    enhanced, bicubic = model.test_compare(x, ctrl.ControlVector(0.1, 0.1, 0.1))
    assert enhanced.shape == bicubic.shape == (27, 27, 3)


@pytest.mark.parametrize("unroll", [2, 4])
def test_body_unroll_matches_compiled_loop(unroll):
    # Partial unrolling is a pure scheduling knob: outputs must be
    # identical to the unroll=1 compiled loop (same op sequence, f32).
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=5)
    p = _params(cfg)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, 12, 12, 3)), jnp.float32
    )
    c = jnp.asarray([[0.5, 0.2, 0.3], [0.1, 0.9, 0.0]], jnp.float32)
    y1 = ctrl.apply(p, x, c, cfg=cfg)
    yu = ctrl.apply(p, x, c, cfg=cfg, unroll=unroll)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(yu), rtol=0, atol=1e-6)
