"""MewZoom super-resolution U-Net — TPU-native functional implementation.

Re-designs the reference flagship model (src/ultrazoom/model.py:43-1032,
the 0.3.0 U-Net generation) as a pure-function JAX model:

* NHWC activations, HWIO kernels, bf16-or-f32 compute policy with f32
  accumulation — the layouts/dtypes XLA:TPU maps straight onto the MXU.
* Parameters are a plain nested-dict pytree whose names mirror the torch
  module paths 1:1 (``unet.encoder.stage1.0.convnet.conv1.weight`` ->
  ``params["unet"]["encoder"]["stage1"][0]["convnet"]["conv1"]["weight"]``)
  so torch checkpoints convert with a pure layout transpose.
* ``apply`` is a single jittable function; activation checkpointing is
  ``jax.checkpoint`` per encoder/decoder block (reference:
  model.py:453-459 swaps in ``torch.utils.checkpoint`` identically).
* The deterministic "zoom" branch is the torch-parity bicubic matmul resize
  (ops/resize.py), so outputs match the torch reference to float tolerance.

Model graph (reference: model.py:149-164)::

    s = bicubic_upsample(x, r)
    z = stem(x)                     # 1x1 conv 3 -> C1
    z, qa = unet(z)                 # 4-stage encoder/decoder w/ ARM skips
    z = head(z)                     # log2(r) SR2X blocks -> 3ch at HR
    return s + z, qa
"""

from __future__ import annotations

import math
from dataclasses import asdict, dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ultrazoom_tpu.nn.init import (
    conv_default_bias,
    conv_default_weight,
)
from ultrazoom_tpu.ops import conv2d, crop_or_pad_to, pixel_shuffle, upsample2d

__all__ = ["MewZoomConfig", "init", "apply", "upscale", "predict_degradation"]

Params = Any


@dataclass(frozen=True)
class MewZoomConfig:
    """Constructor hyper-parameters; field names match the torch ctor kwargs
    (src/ultrazoom/model.py:51-63) so HF ``config.json`` round-trips."""

    upscale_ratio: int = 2
    primary_channels: int = 48
    primary_layers: int = 4
    secondary_channels: int = 96
    secondary_layers: int = 4
    tertiary_channels: int = 192
    tertiary_layers: int = 4
    quaternary_channels: int = 384
    quaternary_layers: int = 8
    hidden_ratio: int = 2
    num_deg_features: int = 3

    def __post_init__(self):
        assert self.upscale_ratio in (2, 4, 8), (
            f"Upscale ratio must be one of {{2, 4, 8}}, got {self.upscale_ratio}."
        )
        assert self.hidden_ratio in (1, 2, 4), "Hidden ratio must be 1, 2, or 4."
        for name in ("primary", "secondary", "tertiary", "quaternary"):
            n = getattr(self, f"{name}_layers")
            assert n > 1, f"Number of {name} layers must be greater than 1."
        assert self.num_deg_features > 0, (
            "Number of degradation features must be greater than 0."
        )

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "MewZoomConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})

    @property
    def stages(self) -> tuple[tuple[int, int], ...]:
        """(channels, total_layers) per resolution stage, full -> 1/8."""
        return (
            (self.primary_channels, self.primary_layers),
            (self.secondary_channels, self.secondary_layers),
            (self.tertiary_channels, self.tertiary_layers),
            (self.quaternary_channels, self.quaternary_layers),
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


class _KeyGen:
    """Deterministic key splitter."""

    def __init__(self, key):
        self._key = key
        self._n = 0

    def __call__(self):
        self._n += 1
        return jax.random.fold_in(self._key, self._n)


def _conv_init(kg, in_ch, out_ch, k, bias=True, groups=1, dtype=jnp.float32):
    shape = (k, k, in_ch // groups, out_ch)
    p = {"weight": conv_default_weight(kg(), shape, dtype)}
    if bias:
        p["bias"] = conv_default_bias(kg(), shape, dtype)
    return p


def _bottleneck_init(kg, c, hidden_ratio, dtype):
    h = c * hidden_ratio
    return {
        "conv1": {"weight": conv_default_weight(kg(), (3, 3, c, h), dtype)},
        "conv2": {"weight": conv_default_weight(kg(), (3, 3, h, c), dtype)},
    }


def _arm_init(kg, c, dtype):
    """AdaptiveResidualMix: gated skip (reference model.py:795-839)."""
    return {
        "conv": {"weight": conv_default_weight(kg(), (1, 1, 2 * c, c), dtype)},
        "alpha": jnp.zeros((), dtype),
    }


def _block_init(kg, c, hidden_ratio, dtype):
    return {
        "convnet": _bottleneck_init(kg, c, hidden_ratio, dtype),
        "skip": _arm_init(kg, c, dtype),
    }


def _pixel_crush_init(kg, cin, cout, factor, dtype):
    return {"conv": {"weight": conv_default_weight(kg(), (factor, factor, cin, cout), dtype)}}


def _subpixel_init(kg, cin, cout, r, dtype):
    return {"conv": {"weight": conv_default_weight(kg(), (3, 3, cin, cout * r * r), dtype)}}


def _sr2x_init(kg, cin, hidden_ratio, cout, dtype):
    return {
        "refiner": _block_init(kg, cin, hidden_ratio, dtype),
        "upscale": _subpixel_init(kg, cin, cout, 2, dtype),
    }


def init(key: jax.Array, cfg: MewZoomConfig, dtype: jnp.dtype = jnp.float32) -> Params:
    """Build a freshly-initialized parameter pytree (torch-default init)."""
    kg = _KeyGen(key)
    (c1, l1), (c2, l2), (c3, l3), (c4, l4) = cfg.stages
    hr = cfg.hidden_ratio

    enc = {
        "stage1": [_block_init(kg, c1, hr, dtype) for _ in range(math.ceil(l1 / 2))],
        "stage2": [_block_init(kg, c2, hr, dtype) for _ in range(math.ceil(l2 / 2))],
        "stage3": [_block_init(kg, c3, hr, dtype) for _ in range(math.ceil(l3 / 2))],
        "stage4": [_block_init(kg, c4, hr, dtype) for _ in range(math.ceil(l4 / 2))],
        "downsample1": _pixel_crush_init(kg, c1, c2, 2, dtype),
        "downsample2": _pixel_crush_init(kg, c2, c3, 2, dtype),
        "downsample3": _pixel_crush_init(kg, c3, c4, 2, dtype),
        "qa_head": {"conv": _conv_init(kg, c4, cfg.num_deg_features, 3, dtype=dtype)},
    }
    dec = {
        "stage1": [_block_init(kg, c4, hr, dtype) for _ in range(l4 // 2)],
        "stage2": [_block_init(kg, c3, hr, dtype) for _ in range(l3 // 2)],
        "stage3": [_block_init(kg, c2, hr, dtype) for _ in range(l2 // 2)],
        "stage4": [_block_init(kg, c1, hr, dtype) for _ in range(l1 // 2)],
        "upsample1": _subpixel_init(kg, c4, c3, 2, dtype),
        "upsample2": _subpixel_init(kg, c3, c2, 2, dtype),
        "upsample3": _subpixel_init(kg, c2, c1, 2, dtype),
        "skip1": _arm_init(kg, c3, dtype),
        "skip2": _arm_init(kg, c2, dtype),
        "skip3": _arm_init(kg, c1, dtype),
    }
    n_sr = int(math.log2(cfg.upscale_ratio))
    head_layers = [
        _sr2x_init(kg, c1, hr, c1 if i < n_sr - 1 else 3, dtype) for i in range(n_sr)
    ]
    return {
        "stem": {"conv": _conv_init(kg, 3, c1, 1, dtype=dtype)},
        "unet": {"encoder": enc, "decoder": dec},
        "head": {"layers": head_layers},
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _bottleneck_apply(p, x):
    """conv3x3 -> SiLU -> conv3x3, WDSR wide activation (model.py:731-778)."""
    z = conv2d(x, p["conv1"]["weight"], padding=1)
    z = jax.nn.silu(z)
    z = conv2d(z, p["conv2"]["weight"], padding=1)
    return z


def _arm_apply(p, x, z):
    """Adaptive residual mix: z_hat = (1-w)x + wz, w = sigmoid(alpha) *
    sigmoid(conv1x1([x; z])) (model.py:826-839)."""
    xz = jnp.concatenate([x, z], axis=-1)
    beta = jax.nn.sigmoid(conv2d(xz, p["conv"]["weight"]))
    alpha = jax.nn.sigmoid(p["alpha"]).astype(x.dtype)
    w = alpha * beta
    return (1.0 - w) * x + w * z


def _block_apply(p, x):
    return _arm_apply(p["skip"], x, _bottleneck_apply(p["convnet"], x))


def _stage_apply(blocks, x, remat: bool):
    f = jax.checkpoint(_block_apply) if remat else _block_apply
    for b in blocks:
        x = f(b, x)
    return x


def _pixel_crush_apply(p, x, factor):
    return conv2d(x, p["conv"]["weight"], stride=factor)


def _subpixel_apply(p, x, r):
    z = conv2d(x, p["conv"]["weight"], padding=1)
    return pixel_shuffle(z, r)


def _qa_apply(p, x):
    z = conv2d(x, p["conv"]["weight"], p["conv"].get("bias"), padding=1)
    return jnp.mean(z.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


def _encoder_apply(p, x, remat):
    z1 = _stage_apply(p["stage1"], x, remat)
    z2 = _pixel_crush_apply(p["downsample1"], z1, 2)
    z2 = _stage_apply(p["stage2"], z2, remat)
    z3 = _pixel_crush_apply(p["downsample2"], z2, 2)
    z3 = _stage_apply(p["stage3"], z3, remat)
    z4 = _pixel_crush_apply(p["downsample3"], z3, 2)
    z4 = _stage_apply(p["stage4"], z4, remat)
    z_qa = _qa_apply(p["qa_head"], z4)
    return z1, z2, z3, z4, z_qa


def _decoder_apply(p, x1, x2, x3, x4, remat):
    z = _stage_apply(p["stage1"], x1, remat)
    z = _subpixel_apply(p["upsample1"], z, 2)
    z = crop_or_pad_to(z, x2.shape[1:3])
    z = _arm_apply(p["skip1"], x2, z)
    z = _stage_apply(p["stage2"], z, remat)
    z = _subpixel_apply(p["upsample2"], z, 2)
    z = crop_or_pad_to(z, x3.shape[1:3])
    z = _arm_apply(p["skip2"], x3, z)
    z = _stage_apply(p["stage3"], z, remat)
    z = _subpixel_apply(p["upsample3"], z, 2)
    z = crop_or_pad_to(z, x4.shape[1:3])
    z = _arm_apply(p["skip3"], x4, z)
    z = _stage_apply(p["stage4"], z, remat)
    return z


def _head_apply(p, z, remat):
    f = (
        jax.checkpoint(lambda b, x: _block_apply(b, x))
        if remat
        else _block_apply
    )
    for layer in p["layers"]:
        z = f(layer["refiner"], z)
        z = _subpixel_apply(layer["upscale"], z, 2)
    return z


def apply(
    params: Params,
    x: jax.Array,
    cfg: MewZoomConfig,
    *,
    remat: bool = False,
    compute_dtype: jnp.dtype | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Forward pass.

    Args:
        params: *materialized* parameter pytree (run
            ``nn.transforms.materialize`` first if weight-norm/LoRA factors
            are attached — typically inside the same jit).
        x: (N, H, W, 3) image in [0, 1].
        cfg: static config (hash-stable dataclass; mark static under jit).
        remat: per-block activation checkpointing.
        compute_dtype: cast activations (e.g. bf16) for the network body;
            the bicubic zoom branch and final residual add stay f32.

    Returns ``(sr, qa)``: (N, H*r, W*r, 3) and (N, num_deg_features).
    """
    in_dtype = x.dtype
    s = upsample2d(x.astype(jnp.float32), cfg.upscale_ratio)

    z = x.astype(compute_dtype) if compute_dtype is not None else x
    z = conv2d(z, params["stem"]["conv"]["weight"], params["stem"]["conv"]["bias"])
    z1, z2, z3, z4, z_qa = _encoder_apply(params["unet"]["encoder"], z, remat)
    z = _decoder_apply(params["unet"]["decoder"], z4, z3, z2, z1, remat)
    z = _head_apply(params["head"], z, remat)

    out = (s + z.astype(jnp.float32)).astype(in_dtype)
    return out, z_qa.astype(in_dtype)


def receptive_field_radius(cfg: MewZoomConfig) -> int:
    """Input-pixel radius influencing one output pixel (pre-upscale),
    composed through the stride-2 pyramid: each 3x3 conv adds its jump
    (1, 2, 4, 8 px at stages 1..4), each PixelCrush/SubpixelConv shifts the
    jump.  Guidance for the tile engine's ``overlap`` (see ctrl docstring)."""
    r, j = 0.0, 1.0
    enc = [math.ceil(l / 2) for _, l in cfg.stages]
    dec = [l // 2 for _, l in cfg.stages]
    for si in range(4):
        r += enc[si] * 2 * j  # two 3x3 convs per block
        if si < 3:
            r += 0.5 * j  # PixelCrush k=2 s=2
            j *= 2
    for si in range(4):
        r += dec[3 - si] * 2 * j
        if si < 3:
            r += 1.0 * j  # SubpixelConv 3x3 before shuffle
            j /= 2
    n_sr = int(math.log2(cfg.upscale_ratio))
    for _ in range(n_sr):
        r += 3.0 * j  # refiner (2 convs) + subpixel conv
        j /= 2
    return math.ceil(r)


def upscale(params, x, cfg, **kw) -> jax.Array:
    """Inference convenience: forward + clamp to [0, 1] (model.py:166-179)."""
    z, _ = apply(params, x, cfg, **kw)
    return jnp.clip(z, 0.0, 1.0)


def predict_degradation(params, x, cfg, **kw) -> jax.Array:
    """QA head output: per-image (blur, noise, jpeg) degradation strengths."""
    _, qa = apply(params, x, cfg, **kw)
    return qa
