"""Shape-driven Ctrl importer vs a synthetic torch checkpoint with
*unfamiliar* key names (simulating the unknown 0.2.x naming scheme)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ultrazoom_tpu.convert.ctrl_import import import_ctrl_state_dict
from ultrazoom_tpu.models import ctrl

torch = pytest.importorskip("torch")


def _synthetic_02x_state_dict(c=10, hc=20, layers=3, ratio=3, controllable=True):
    """Plausible 0.2.x-style checkpoint with names we do NOT control."""
    g = torch.Generator().manual_seed(0)
    sd = {}
    sd["encoder.stem.weight"] = torch.randn(c, 3, 1, 1, generator=g)
    sd["encoder.stem.bias"] = torch.randn(c, generator=g)
    for i in range(layers):
        sd[f"encoder.blocks.{i}.expand.weight"] = torch.randn(hc, c, 3, 3, generator=g) * 0.1
        if controllable:
            sd[f"encoder.blocks.{i}.control.weight"] = torch.randn(2 * hc, 3, generator=g) * 0.1
            sd[f"encoder.blocks.{i}.control.bias"] = torch.randn(2 * hc, generator=g) * 0.1
        sd[f"encoder.blocks.{i}.reduce.weight"] = torch.randn(c, hc, 3, 3, generator=g) * 0.1
    sd["tail.subpixel.weight"] = torch.randn(3 * ratio**2, c, 3, 3, generator=g) * 0.1
    return sd


def test_import_infers_config_and_matches_torch_forward():
    import torch.nn.functional as F

    c, hc, L, r = 10, 20, 3, 3
    sd = _synthetic_02x_state_dict(c, hc, L, r)
    params, cfg = import_ctrl_state_dict(sd)

    assert cfg.num_channels == c
    assert cfg.hidden_ratio == 2
    assert cfg.num_layers == L
    assert cfg.upscale_ratio == r
    assert cfg.controllable

    # Forward parity vs a literal torch computation of the same graph.
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 12, 12)).astype(np.float32)
    cvec = np.asarray([[0.4, 0.1, 0.7]], np.float32)

    xt = torch.from_numpy(x)
    ct = torch.from_numpy(cvec)
    st = F.interpolate(xt, scale_factor=r, mode="bicubic")
    z = F.conv2d(xt, sd["encoder.stem.weight"], sd["encoder.stem.bias"])
    for i in range(L):
        h = F.conv2d(z, sd[f"encoder.blocks.{i}.expand.weight"], padding=1)
        gb = ct @ sd[f"encoder.blocks.{i}.control.weight"].T + sd[f"encoder.blocks.{i}.control.bias"]
        gamma, beta = gb.chunk(2, dim=-1)
        h = h * (1 + gamma[:, :, None, None]) + beta[:, :, None, None]
        h = F.silu(h)
        h = F.conv2d(h, sd[f"encoder.blocks.{i}.reduce.weight"], padding=1)
        z = z + h
    z = F.conv2d(z, sd["tail.subpixel.weight"], padding=1)
    z = F.pixel_shuffle(z, r)
    want = (st + z).numpy()

    got = ctrl.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(cvec), cfg=cfg
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_import_non_controllable():
    sd = _synthetic_02x_state_dict(controllable=False)
    params, cfg = import_ctrl_state_dict(sd)
    assert not cfg.controllable
    assert "film_w" not in params["body"]


def test_import_roundtrip_from_our_own_export():
    """Our own Ctrl export must re-import by shape alone."""
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    import jax

    params = ctrl.init(jax.random.key(0), cfg)
    flat = ctrl.params_to_torch_flat(params, cfg)
    params2, cfg2 = import_ctrl_state_dict(flat)
    assert cfg2 == cfg
    x = jnp.full((1, 8, 8, 3), 0.5, jnp.float32)
    c = jnp.asarray([[0.2, 0.4, 0.6]], jnp.float32)
    a = ctrl.apply(params, x, c, cfg=cfg)
    b = ctrl.apply(params2, x, c, cfg=cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
