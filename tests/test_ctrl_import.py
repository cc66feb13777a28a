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


def _torch_ctrl_model(c=10, hc=20, layers=3, ratio=3, seed=0):
    """A live torch 0.2.x-style model (so real parametrizations can be
    attached the way the reference's loaders expect, validate.py:55-65)."""
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.expand = nn.Conv2d(c, hc, 3, padding=1, bias=False)
            self.control = nn.Linear(3, 2 * hc)
            self.reduce = nn.Conv2d(hc, c, 3, padding=1, bias=False)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(3, c, 1)
            self.blocks = nn.ModuleList([Block() for _ in range(layers)])
            self.tail = nn.Conv2d(c, 3 * ratio**2, 3, padding=1, bias=False)

        def forward(self, x, cv):
            s = F.interpolate(x, scale_factor=ratio, mode="bicubic")
            z = self.stem(x)
            for b in self.blocks:
                h = b.expand(z)
                gamma, beta = b.control(cv).chunk(2, dim=-1)
                h = h * (1 + gamma[:, :, None, None]) + beta[:, :, None, None]
                z = z + b.reduce(F.silu(h))
            return s + F.pixel_shuffle(self.tail(z), ratio)

    return Model()


def _add_weight_norms(model):
    """Reference add_weight_norms recipe: every conv (model.py:117-122)."""
    import torch.nn as nn
    from torch.nn.utils.parametrizations import weight_norm

    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            weight_norm(m)


def test_import_folds_weight_norm_and_compile_prefix():
    """A 0.2.x training checkpoint is SAVED in parametrized form with
    torch.compile prefixes (reference validate.py:55-65 recipe); the
    shape-driven importer must fold g/v and strip _orig_mod. — previously
    v was silently misread as the kernel and g dropped."""
    import torch.nn.utils.parametrize as parametrize

    c, hc, L, r = 10, 20, 3, 3
    model = _torch_ctrl_model(c, hc, L, r)
    _add_weight_norms(model)
    sd = {f"_orig_mod.{k}": v.clone() for k, v in model.state_dict().items()}
    assert any("parametrizations.weight.original0" in k for k in sd)

    params, cfg = import_ctrl_state_dict(sd)
    assert (cfg.num_channels, cfg.num_layers, cfg.upscale_ratio) == (c, L, r)
    assert cfg.controllable

    # Torch side of the recipe: remove_parameterizations -> plain weights.
    import torch.nn as nn

    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            parametrize.remove_parametrizations(m, "weight")

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 3, 12, 12)).astype(np.float32)
    cvec = np.asarray([[0.4, 0.1, 0.7], [0.0, 1.0, 0.2]], np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(cvec)).numpy()

    got = ctrl.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(cvec), cfg=cfg
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_import_folds_lora_on_weight_norm():
    """ChannelLoRA adapters stacked on weight norm (export_model.ipynb
    cell-3 load path) fold into the kernels with the out-of-band alpha."""
    import sys

    sys.path.insert(0, str(pytest.importorskip("pathlib").Path(__file__).parent))
    from reference_oracle import load_reference_model_module, reference_available

    if not reference_available():
        pytest.skip("reference snapshot unavailable")
    ref = load_reference_model_module()

    import torch.nn as nn
    import torch.nn.utils.parametrize as parametrize

    c, hc, L, r = 8, 16, 2, 2
    alpha = 0.7
    model = _torch_ctrl_model(c, hc, L, r)
    _add_weight_norms(model)
    torch.manual_seed(7)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            parametrize.register_parametrization(
                m, "weight", ref.ChannelLoRA(m, rank=2, alpha=alpha)
            )
    # Make the (zero-init lora_b) adapters non-trivial.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("lora_b"):
                p.copy_(torch.randn_like(p) * 0.05)

    sd = {k: v.clone() for k, v in model.state_dict().items()}
    assert any(".lora_a" in k for k in sd)
    params, cfg = import_ctrl_state_dict(sd, lora_alpha=alpha)

    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            parametrize.remove_parametrizations(m, "weight")

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 3, 10, 10)).astype(np.float32)
    cvec = np.asarray([[0.3, 0.6, 0.9]], np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(cvec)).numpy()
    got = ctrl.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(cvec), cfg=cfg
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


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


def test_import_alphabetical_key_order_deep_body():
    """Safetensors files return keys ALPHABETICALLY ('body.10' < 'body.2'),
    which scrambles layer order for bodies deeper than 10 layers unless the
    importer natural-sorts.  Regression for a bug found on a real trained
    12-layer artifact (the synthetic tests used <10 layers and never hit
    it): import from an alphabetically-ordered dict must equal the
    insertion-ordered import."""
    import jax

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=12)
    params = ctrl.init(jax.random.key(3), cfg)
    flat = ctrl.params_to_torch_flat(params, cfg)
    scrambled = dict(sorted(flat.items()))  # alphabetical, like safetensors
    assert list(scrambled) != list(flat)  # the orders genuinely differ
    params2, cfg2 = import_ctrl_state_dict(scrambled)
    assert cfg2 == cfg
    x = jnp.linspace(0, 1, 1 * 8 * 8 * 3, dtype=jnp.float32).reshape(1, 8, 8, 3)
    c = jnp.asarray([[0.9, 0.1, 0.5]], jnp.float32)
    a = ctrl.apply(params, x, c, cfg=cfg)
    b = ctrl.apply(params2, x, c, cfg=cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
