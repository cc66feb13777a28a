"""Shape-and-contract tests mirroring the reference's unit-test style
(tests/test_model.py in the snapshot: ctor validation, output shapes,
clamp bounds, param formulas, parametrization presence)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ultrazoom_tpu.models import bouncer, ctrl, unet
from ultrazoom_tpu.nn import add_lora, add_weight_norm, materialize

TINY = dict(
    primary_channels=8, primary_layers=2,
    secondary_channels=12, secondary_layers=2,
    tertiary_channels=16, tertiary_layers=2,
    quaternary_channels=24, quaternary_layers=2,
)


# -- constructor validation (reference asserts) -----------------------------

def test_unet_rejects_bad_upscale_ratio():
    with pytest.raises(AssertionError, match="Upscale ratio"):
        unet.MewZoomConfig(upscale_ratio=3, **TINY)


def test_unet_rejects_bad_hidden_ratio():
    with pytest.raises(AssertionError, match="Hidden ratio"):
        unet.MewZoomConfig(upscale_ratio=2, hidden_ratio=3, **TINY)


def test_unet_rejects_single_layer_stage():
    bad = dict(TINY, primary_layers=1)
    with pytest.raises(AssertionError, match="primary layers"):
        unet.MewZoomConfig(upscale_ratio=2, **bad)


def test_unet_rejects_zero_deg_features():
    with pytest.raises(AssertionError, match="degradation features"):
        unet.MewZoomConfig(upscale_ratio=2, num_deg_features=0, **TINY)


def test_ctrl_rejects_bad_ratio():
    with pytest.raises(AssertionError, match="Upscale ratio"):
        ctrl.MewZoomCtrlConfig(upscale_ratio=8)


# -- stage split semantics (ceil/floor, reference model.py:277-300) ---------

@pytest.mark.parametrize("layers,enc,dec", [(2, 1, 1), (3, 2, 1), (5, 3, 2), (8, 4, 4)])
def test_encoder_decoder_layer_split(layers, enc, dec):
    cfg = unet.MewZoomConfig(
        upscale_ratio=2, **{**TINY, "primary_layers": layers}
    )
    params = unet.init(jax.random.key(0), cfg)
    assert len(params["unet"]["encoder"]["stage1"]) == enc == math.ceil(layers / 2)
    assert len(params["unet"]["decoder"]["stage4"]) == dec == layers // 2


# -- output shapes over ratios and odd sizes --------------------------------

@pytest.mark.parametrize("ratio", [2, 4, 8])
@pytest.mark.parametrize("hw", [(16, 16), (17, 23)])
def test_unet_output_shapes(ratio, hw):
    cfg = unet.MewZoomConfig(upscale_ratio=ratio, **TINY)
    params = unet.init(jax.random.key(0), cfg)
    x = jnp.full((1, *hw, 3), 0.5, jnp.float32)
    sr, qa = unet.apply(params, x, cfg)
    assert sr.shape == (1, hw[0] * ratio, hw[1] * ratio, 3)
    assert qa.shape == (1, cfg.num_deg_features)


def test_head_layer_count_is_log2_ratio():
    for ratio in (2, 4, 8):
        cfg = unet.MewZoomConfig(upscale_ratio=ratio, **TINY)
        params = unet.init(jax.random.key(0), cfg)
        assert len(params["head"]["layers"]) == int(math.log2(ratio))
        # last SR2X block emits 3 channels
        last = params["head"]["layers"][-1]["upscale"]["conv"]["weight"]
        assert last.shape[-1] == 3 * 4  # 3 channels * r^2 with r=2


# -- parametrization presence ------------------------------------------------

def test_weight_norm_structure():
    cfg = unet.MewZoomConfig(upscale_ratio=2, **TINY)
    params = add_weight_norm(unet.init(jax.random.key(0), cfg))
    w = params["unet"]["encoder"]["stage1"][0]["convnet"]["conv1"]["weight"]
    assert set(w.keys()) == {"g", "v"}
    assert w["g"].shape == (w["v"].shape[-1],)
    # materialize returns plain kernels again
    mat = materialize(params)
    assert mat["unet"]["encoder"]["stage1"][0]["convnet"]["conv1"]["weight"].ndim == 4


@pytest.mark.slow
def test_lora_structure_and_shapes():
    cfg = unet.MewZoomConfig(upscale_ratio=2, **TINY)
    params = add_lora(unet.init(jax.random.key(0), cfg), 4, 2.0, jax.random.key(1))
    w = params["unet"]["encoder"]["stage1"][0]["convnet"]["conv1"]["weight"]
    kh, kw, i, o = w["base"].shape
    assert w["lora_a"].shape == (kh, kw, o, 4)
    assert w["lora_b"].shape == (kh, kw, 4, i)
    assert float(jnp.abs(w["lora_b"]).max()) == 0.0  # B starts at zero


# -- param-count formulas -----------------------------------------------------

def test_inverted_bottleneck_param_formula():
    cfg = unet.MewZoomConfig(upscale_ratio=2, **TINY)
    params = unet.init(jax.random.key(0), cfg)
    block = params["unet"]["encoder"]["stage1"][0]["convnet"]
    c, h = 8, 16  # primary channels, hidden_ratio 2
    assert block["conv1"]["weight"].size == 3 * 3 * c * h
    assert block["conv2"]["weight"].size == 3 * 3 * h * c


@pytest.mark.slow
def test_bouncer_logit_bounds_and_predict():
    cfg = bouncer.BouncerConfig(
        primary_channels=8, primary_layers=1, secondary_channels=12,
        secondary_layers=1, tertiary_channels=16, tertiary_layers=1,
        quaternary_channels=24, quaternary_layers=1,
    )
    params = bouncer.init(jax.random.key(0), cfg)
    x = jnp.full((2, 32, 32, 3), 0.5, jnp.float32)
    logit = bouncer.predict(params, x)
    assert logit.shape == (2, 1) and np.isfinite(np.asarray(logit)).all()


# -- clamp bounds -------------------------------------------------------------

def test_upscale_outputs_clamped():
    cfg = unet.MewZoomConfig(upscale_ratio=2, **TINY)
    params = unet.init(jax.random.key(3), cfg)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1, 16, 16, 3)), jnp.float32
    )
    out = unet.upscale(params, x, cfg)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
