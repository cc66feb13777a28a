"""Bouncer — the adversarial critic network (reference model.py:1035-1358).

ConvNeXt-flavoured feature pyramid: PixelCrush stride-2 downsample before
each of 4 stages (so stages run at 1/2 .. 1/16 input resolution), stages of
DetectorBlocks (depthwise-separable k7 -> SiLU -> 1x1, ARM gated skip), and a
position-invariant real/fake head (global mean pool -> 1x1 conv -> logit).

Returns the multi-scale features (z1..z4) alongside the logit because the
fine-tune generator loss feature-matches on z2/z3 (fine-tune.py:294-298).

Spectral norm: torch applies it to every conv *except* the ARM gate convs
(DetectorBlock.add_spectral_norms touches conv1/conv2 only,
model.py:1267-1270).  Use :func:`spectral_norm_paths` with
nn.transforms.spectral_* to reproduce that exactly.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ultrazoom_tpu.nn.init import conv_default_bias, conv_default_weight
from ultrazoom_tpu.ops import conv2d

__all__ = ["BouncerConfig", "init", "apply", "predict", "PRESETS"]

Params = Any


@dataclass(frozen=True)
class BouncerConfig:
    input_channels: int = 3
    primary_channels: int = 64
    primary_layers: int = 3
    secondary_channels: int = 126  # sic — "small" preset value in the
    # reference (model.py:1052); preserved for checkpoint compatibility.
    secondary_layers: int = 4
    tertiary_channels: int = 256
    tertiary_layers: int = 6
    quaternary_channels: int = 512
    quaternary_layers: int = 3
    hidden_ratio: int = 4

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "BouncerConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


PRESETS = {
    "small": BouncerConfig(),
    "medium": BouncerConfig(
        primary_channels=96, secondary_channels=192, secondary_layers=4,
        tertiary_channels=384, tertiary_layers=12, quaternary_channels=768,
    ),
    "large": BouncerConfig(
        primary_channels=128, secondary_channels=256, secondary_layers=6,
        tertiary_channels=512, tertiary_layers=24, quaternary_channels=1024,
    ),
}


def from_preconfigured(model_size: str, key: jax.Array, dtype=jnp.float32):
    """Reference-API analog (``Bouncer.from_preconfigured``, model.py:1041):
    returns (params, config) for a preset critic size."""
    assert model_size in PRESETS, (
        f"Invalid model size {model_size!r}; choose from {sorted(PRESETS)}."
    )
    cfg = PRESETS[model_size]
    return init(key, cfg, dtype), cfg


class _KeyGen:
    def __init__(self, key):
        self._key, self._n = key, 0

    def __call__(self):
        self._n += 1
        return jax.random.fold_in(self._key, self._n)


def _dw_sep_init(kg, cin, cout, k, dtype):
    dw_shape = (k, k, 1, cin)
    pw_shape = (1, 1, cin, cout)
    return {
        "depthwise": {"weight": conv_default_weight(kg(), dw_shape, dtype)},
        "pointwise": {
            "weight": conv_default_weight(kg(), pw_shape, dtype),
            "bias": conv_default_bias(kg(), pw_shape, dtype),
        },
    }


def _arm_init(kg, c, dtype):
    return {
        "conv": {"weight": conv_default_weight(kg(), (1, 1, 2 * c, c), dtype)},
        "alpha": jnp.zeros((), dtype),
    }


def _detector_block_init(kg, c, hidden_ratio, dtype):
    h = c * hidden_ratio
    c2_shape = (1, 1, h, c)
    return {
        "conv1": _dw_sep_init(kg, c, h, 7, dtype),
        "conv2": {
            "weight": conv_default_weight(kg(), c2_shape, dtype),
            "bias": conv_default_bias(kg(), c2_shape, dtype),
        },
        "skip": _arm_init(kg, c, dtype),
    }


def _crush_init(kg, cin, cout, f, dtype):
    return {"conv": {"weight": conv_default_weight(kg(), (f, f, cin, cout), dtype)}}


def init(key: jax.Array, cfg: BouncerConfig, dtype=jnp.float32) -> Params:
    kg = _KeyGen(key)
    hr = cfg.hidden_ratio
    cs = (
        cfg.primary_channels,
        cfg.secondary_channels,
        cfg.tertiary_channels,
        cfg.quaternary_channels,
    )
    ls = (
        cfg.primary_layers,
        cfg.secondary_layers,
        cfg.tertiary_layers,
        cfg.quaternary_layers,
    )
    detector = {}
    prev = cfg.input_channels
    for i, (c, L) in enumerate(zip(cs, ls), start=1):
        detector[f"downsample{i}"] = _crush_init(kg, prev, c, 2, dtype)
        detector[f"stage{i}"] = [
            _detector_block_init(kg, c, hr, dtype) for _ in range(L)
        ]
        prev = c
    head_shape = (1, 1, cs[-1], 1)
    return {
        "detector": detector,
        "head": {
            "conv": {
                "weight": conv_default_weight(kg(), head_shape, dtype),
                "bias": conv_default_bias(kg(), head_shape, dtype),
            }
        },
    }


def _arm_apply(p, x, z):
    xz = jnp.concatenate([x, z], axis=-1)
    beta = jax.nn.sigmoid(conv2d(xz, p["conv"]["weight"]))
    w = jax.nn.sigmoid(p["alpha"]).astype(x.dtype) * beta
    return (1.0 - w) * x + w * z


def _detector_block_apply(p, x):
    c = x.shape[-1]
    z = conv2d(x, p["conv1"]["depthwise"]["weight"], padding=3, groups=c)
    z = conv2d(z, p["conv1"]["pointwise"]["weight"], p["conv1"]["pointwise"]["bias"])
    z = jax.nn.silu(z)
    z = conv2d(z, p["conv2"]["weight"], p["conv2"]["bias"])
    return _arm_apply(p["skip"], x, z)


def apply(
    params: Params, x: jax.Array, *, remat: bool = False,
    compute_dtype: jnp.dtype | None = None,
) -> tuple[jax.Array, ...]:
    """Forward: (z1, z2, z3, z4, logit) for NHWC input."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    det = params["detector"]
    block = jax.checkpoint(_detector_block_apply) if remat else _detector_block_apply
    zs = []
    z = x
    for i in range(1, 5):
        z = conv2d(z, det[f"downsample{i}"]["conv"]["weight"], stride=2)
        for bp in det[f"stage{i}"]:
            z = block(bp, z)
        zs.append(z)
    pooled = jnp.mean(zs[-1].astype(jnp.float32), axis=(1, 2), keepdims=True)
    logit = conv2d(
        pooled, params["head"]["conv"]["weight"], params["head"]["conv"]["bias"]
    )
    return (*zs, logit.reshape(x.shape[0], 1))


def predict(params: Params, x: jax.Array, **kw) -> jax.Array:
    """Real/fake logit only (reference ``Bouncer.predict``)."""
    return apply(params, x, **kw)[-1]


def spectral_norm_paths(path: tuple) -> bool:
    """Which weights receive spectral norm: every conv except ARM gates
    (matches reference add_spectral_norms coverage)."""
    return "skip" not in path
