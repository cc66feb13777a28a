"""Receptive-field helpers: analytic radius vs empirically measured
influence extent (gradient of one output pixel w.r.t. the input)."""

import numpy as np
import jax
import jax.numpy as jnp

from ultrazoom_tpu.models import ctrl, unet


def test_ctrl_rf_matches_empirical():
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=3)
    params = ctrl.init(jax.random.key(0), cfg)
    r_analytic = ctrl.receptive_field_radius(cfg)  # 2*3+1 = 7

    size = 32
    center = size // 2

    def probe(x):
        # residual branch only (the bicubic skip has its own tiny support)
        y = ctrl.apply(params, x, jnp.zeros((1, 3)), cfg=cfg)
        s_bicubic = ctrl.upsample2d(x, 2)
        return ((y - s_bicubic) ** 2)[0, center * 2, center * 2, :].sum()

    g = jax.grad(probe)(jnp.full((1, size, size, 3), 0.5, jnp.float32))
    mask = np.abs(np.asarray(g))[0].sum(-1) > 0
    ys, xs = np.nonzero(mask)
    measured = max(
        center - ys.min(), ys.max() - center, center - xs.min(), xs.max() - center
    )
    assert measured <= r_analytic, (measured, r_analytic)
    # analytic bound should be tight-ish (within a couple px)
    assert measured >= r_analytic - 2, (measured, r_analytic)


def test_unet_rf_reasonable():
    cfg = unet.MewZoomConfig(
        upscale_ratio=2,
        primary_channels=8, primary_layers=2,
        secondary_channels=12, secondary_layers=2,
        tertiary_channels=16, tertiary_layers=2,
        quaternary_channels=24, quaternary_layers=2,
    )
    r = unet.receptive_field_radius(cfg)
    assert 20 <= r <= 120, r  # pyramid model: tens of pixels
    # Default (much deeper) config has a wider field.
    assert unet.receptive_field_radius(unet.MewZoomConfig()) > r
