"""MewZoom "Ctrl" — the controllable flat-body SR architecture (0.1.x/0.2.x).

The reference snapshot ships only the 0.3.0 U-Net; the published HF
checkpoints (MewZoom-{2,3,4}X[-Ctrl], README.md:35-42) are the earlier flat
"LR-subspace" architecture whose source is absent from the snapshot.  This
module is our reconstruction from the in-repo evidence (SURVEY.md section
0.1): a flat residual conv body operating at LR resolution, channel-wise
FiLM control modules conditioned on a 3-dim ControlVector (README.md:88-129,
validate.py:73-97), a single pixel-shuffle tail supporting x{2,3,4}, and the
bicubic zoom skip.  Parameter counts land close to (not exactly on) the
README table: 2X 48ch/20L = 1.7M (published "1.8M"), 3X 54ch/30L = 3.2M
(published "3.5M"), 4X 96ch/40L = 13.4M (published "14M") — wide-activation
body, hidden ratio 2.  The residual suggests the published models carry
extra structure this reconstruction lacks (e.g. a tail expansion conv);
the shape-driven importer (convert/ctrl_import.py) is the absorption
layer for such surprises, keyed on shapes rather than this exact layout.

TPU-first design notes:

* The body is L identical blocks -> parameters are stored *stacked* along a
  leading layer axis and the body runs as one ``lax.scan``.  Compile time is
  O(1) in depth (the 40-layer 4X model traces a single block), and XLA keeps
  the whole loop on-chip.
* Each block is conv3x3 C->hC, FiLM(c), SiLU, conv3x3 hC->C, residual add —
  the wide-activation (WDSR) bottleneck the 0.3.0 code also uses, which is
  the FLOPs shape the MXU likes.
* FiLM: ``(gamma, beta) = c @ W_i + b_i``; ``h <- h * (1 + gamma) + beta``
  applied channel-wise at the wide layer.  ``c`` is the
  (blur, noise, jpeg) control vector in [0, 1]^3.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ultrazoom_tpu.nn.init import (
    conv_default_bias,
    conv_default_weight,
)
from ultrazoom_tpu.ops import conv2d, pixel_shuffle, upsample2d

__all__ = ["ControlVector", "MewZoomCtrlConfig", "init", "apply", "upscale", "test_compare"]

Params = Any


@dataclass
class ControlVector:
    """User-facing enhancement control, README.md:94 semantics.

    Each field is the *assumed* degradation strength present in the input,
    in [0, 1]; higher values request a stronger corresponding enhancement
    (deblur / denoise / deartifact).
    """

    gaussian_blur: float = 0.0
    gaussian_noise: float = 0.0
    jpeg_compression: float = 0.0

    def __post_init__(self):
        for name in ("gaussian_blur", "gaussian_noise", "jpeg_compression"):
            v = getattr(self, name)
            assert 0.0 <= v <= 1.0, f"{name} must be in [0, 1], got {v}."

    def to_tensor(self) -> jax.Array:
        """(1, 3) control tensor — order (blur, noise, jpeg) as in the
        reference's ONNX interface (README.md:181-185)."""
        return jnp.asarray(
            [[self.gaussian_blur, self.gaussian_noise, self.jpeg_compression]],
            dtype=jnp.float32,
        )

    # JAX-flavoured alias.
    to_array = to_tensor


@dataclass(frozen=True)
class MewZoomCtrlConfig:
    upscale_ratio: int = 2
    num_channels: int = 48
    num_layers: int = 20
    hidden_ratio: int = 2
    controllable: bool = True
    num_control_features: int = 3

    def __post_init__(self):
        assert self.upscale_ratio in (2, 3, 4), "Upscale ratio must be 2, 3, or 4."
        assert self.hidden_ratio in (1, 2, 4), "Hidden ratio must be 1, 2, or 4."
        assert self.num_layers > 0 and self.num_channels > 0

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "MewZoomCtrlConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


# Preset configs matching the published checkpoint table (README.md:35-42).
PRESETS = {
    "2x": MewZoomCtrlConfig(2, 48, 20),
    "3x": MewZoomCtrlConfig(3, 54, 30),
    "4x": MewZoomCtrlConfig(4, 96, 40),
}


def init(key: jax.Array, cfg: MewZoomCtrlConfig, dtype=jnp.float32) -> Params:
    c, h = cfg.num_channels, cfg.num_channels * cfg.hidden_ratio
    L, r = cfg.num_layers, cfg.upscale_ratio
    keys = jax.random.split(key, 4 + 4 * L)
    ki = iter(range(len(keys)))

    def stack(make):
        return jnp.stack([make(keys[next(ki)]) for _ in range(L)])

    # Stacked scan-body layout: every conv kernel lives under a "weight"
    # key (like the rest of the framework) so nn/transforms weight-norm /
    # LoRA apply to 100% of conv params (reference model.py:117-129).
    body = {
        "conv1": {"weight": stack(lambda k: conv_default_weight(k, (3, 3, c, h), dtype))},
        "conv2": {"weight": stack(lambda k: conv_default_weight(k, (3, 3, h, c), dtype))},
    }
    if cfg.controllable:
        f = cfg.num_control_features
        # torch Linear default init: U(+-1/sqrt(fan_in)), fan_in = 3.
        bound = 1.0 / jnp.sqrt(jnp.asarray(float(f)))
        body["film_w"] = stack(
            lambda k: jax.random.uniform(k, (f, 2 * h), dtype, -bound, bound)
        )
        body["film_b"] = jnp.zeros((L, 2 * h), dtype)

    stem_shape = (1, 1, 3, c)
    tail_shape = (3, 3, c, 3 * r * r)
    return {
        "stem": {
            "conv": {
                "weight": conv_default_weight(keys[next(ki)], stem_shape, dtype),
                "bias": conv_default_bias(keys[next(ki)], stem_shape, dtype),
            }
        },
        "body": body,
        "tail": {
            "conv": {"weight": conv_default_weight(keys[next(ki)], tail_shape, dtype)}
        },
    }


def _body_scan(
    body: Params,
    z: jax.Array,
    c: jax.Array | None,
    remat: bool | str = False,
    unroll: int = 1,
) -> jax.Array:
    controllable = "film_w" in body

    xs = {"conv1": body["conv1"]["weight"], "conv2": body["conv2"]["weight"]}
    if controllable:
        # All layers' FiLM (gamma, beta) precomputed with ONE batched einsum
        # outside the scan: (B,3)@(L,3,2H) is a single MXU call instead of L
        # tiny per-layer matmuls inside the loop body (and inside its remat
        # recompute).  The per-layer (B,3)@(3,2H) matmul was pathological on
        # TPU: a K=3 contraction inside a scan breaks fusion with the conv
        # and forces a layout round-trip every layer.
        xs["gb"] = (
            jnp.einsum("bf,lfh->lbh", c, body["film_w"])
            + body["film_b"][:, None, :]
        )

    def step(z, p):
        h = conv2d(z, p["conv1"], padding=1)
        if remat == "hidden":
            from jax.ad_checkpoint import checkpoint_name

            h = checkpoint_name(h, "ctrl_hidden")
        if controllable:
            gamma, beta = jnp.split(p["gb"].astype(h.dtype), 2, axis=-1)
            h = h * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]
        h = jax.nn.silu(h)
        h = conv2d(h, p["conv2"], padding=1)
        return z + h, None

    if remat == "hidden":
        # Selective checkpointing: save the hC-wide conv1 output per layer
        # and recompute only the pointwise tail (FiLM, SiLU) in the backward
        # pass — zero conv recompute, unlike full remat which re-runs conv1.
        # Costs one (L, B, H, W, hC) bf16 stack of HBM; at the largest
        # training config (4X preset, batch 32, 64^2 LR) that is 2.5 GB —
        # comfortably within a v5e's 16 GB next to params and carries.
        step = jax.checkpoint(
            step,
            policy=jax.checkpoint_policies.save_only_these_names("ctrl_hidden"),
        )
    elif remat:
        # Full per-layer checkpointing (reference
        # enable_activation_checkpointing analog, model.py:453-459): only
        # the C-wide carry is saved; the hC-wide hiddens — the dominant
        # training allocation — are recomputed in the backward pass.
        step = jax.checkpoint(step)

    # ``unroll`` trades compile time for cross-layer fusion freedom: XLA
    # gets ``unroll`` consecutive blocks in one loop body and can overlap
    # the residual add / FiLM epilogue of block i with block i+1's conv.
    # Full unrolling never finished compiling through the remote-compile
    # tunnel (ARCHITECTURE.md "lax.scan over the Ctrl body"); small partial
    # unrolls keep compile bounded.  Measured on v5e at the headline config
    # before changing the default — see ARCHITECTURE.md.
    z, _ = jax.lax.scan(step, z, xs, unroll=unroll)
    return z


def apply(
    params: Params,
    x: jax.Array,
    c: jax.Array | ControlVector | None = None,
    *,
    cfg: MewZoomCtrlConfig,
    compute_dtype: jnp.dtype | None = None,
    remat: bool | str = False,
    unroll: int = 1,
) -> jax.Array:
    """Forward: bicubic zoom + learned residual enhancement.

    Args:
        x: (N, H, W, 3) image in [0, 1].
        c: control vector — (3,), (1, 3) or (N, 3) array, a ControlVector,
           or None (-> zeros, i.e. no enhancement steer).
        remat: False = no activation checkpointing; True = full per-layer
           checkpointing (save only the C-wide carries); "hidden" =
           selective (save the hC-wide conv1 outputs, recompute pointwise
           ops only — the fastest policy that still bounds training memory).
        unroll: lax.scan partial-unroll factor for the body (1 = compiled
           loop).  >1 trades compile time for cross-layer fusion freedom;
           measured guidance in ARCHITECTURE.md.
    """
    if isinstance(c, ControlVector):
        c = c.to_tensor()
    if cfg.controllable:
        if c is None:
            c = jnp.zeros((x.shape[0], cfg.num_control_features), jnp.float32)
        c = jnp.atleast_2d(jnp.asarray(c, jnp.float32))
        if c.shape[0] == 1 and x.shape[0] > 1:
            c = jnp.broadcast_to(c, (x.shape[0], c.shape[1]))

    in_dtype = x.dtype
    s = upsample2d(x.astype(jnp.float32), cfg.upscale_ratio)

    z = x.astype(compute_dtype) if compute_dtype is not None else x
    z = conv2d(z, params["stem"]["conv"]["weight"], params["stem"]["conv"]["bias"])
    z = _body_scan(
        params["body"],
        z,
        c if cfg.controllable else None,
        remat=remat,
        unroll=unroll,
    )
    z = conv2d(z, params["tail"]["conv"]["weight"], padding=1)
    z = pixel_shuffle(z, cfg.upscale_ratio)

    return (s + z.astype(jnp.float32)).astype(in_dtype)


def upscale(params, x, c=None, *, cfg, **kw) -> jax.Array:
    """Inference: forward + clamp to [0, 1] (reference API
    ``model.upscale(x, c)``, README.md:124)."""
    return jnp.clip(apply(params, x, c, cfg=cfg, **kw), 0.0, 1.0)


def receptive_field_radius(cfg: MewZoomCtrlConfig) -> int:
    """Input-pixel radius influencing one output pixel (pre-upscale):
    stem 1x1 (0) + L blocks x two 3x3 convs (+1 each) + tail 3x3 (+1).
    Use as guidance for the tile engine's ``overlap``: influence decays
    fast with distance, so a fraction (e.g. 1/4) of this is visually
    lossless; the full radius makes tiled == whole-image to float noise."""
    return 2 * cfg.num_layers + 1


def params_to_torch_flat(params: Params, cfg: MewZoomCtrlConfig) -> dict:
    """Unstack the scan body into per-layer torch-layout tensors.

    Key scheme: ``stem.conv.{weight,bias}``, ``body.{i}.conv1.weight``,
    ``body.{i}.film.{weight,bias}``, ``body.{i}.conv2.weight``,
    ``tail.conv.weight`` — conv kernels OIHW, FiLM linear (out, in) as torch
    ``nn.Linear`` stores it.
    """
    import numpy as np

    def oihw(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    flat = {
        "stem.conv.weight": oihw(params["stem"]["conv"]["weight"]),
        "stem.conv.bias": np.asarray(params["stem"]["conv"]["bias"]),
        "tail.conv.weight": oihw(params["tail"]["conv"]["weight"]),
    }
    body = params["body"]
    for i in range(cfg.num_layers):
        flat[f"body.{i}.conv1.weight"] = oihw(body["conv1"]["weight"][i])
        flat[f"body.{i}.conv2.weight"] = oihw(body["conv2"]["weight"][i])
        if cfg.controllable:
            # torch Linear: weight (out, in) with y = x W^T; ours is (in, out).
            flat[f"body.{i}.film.weight"] = np.asarray(body["film_w"][i]).T.copy()
            flat[f"body.{i}.film.bias"] = np.asarray(body["film_b"][i])
    return flat


def torch_flat_to_params(sd: dict, cfg: MewZoomCtrlConfig) -> Params:
    """Restack per-layer torch tensors into the scan body layout."""
    import numpy as np

    def to_np(v):
        return v if isinstance(v, np.ndarray) else v.detach().cpu().numpy()

    sd = {k.replace("_orig_mod.", ""): to_np(v) for k, v in sd.items()}

    def hwio(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    L = cfg.num_layers
    body = {
        "conv1": {"weight": jnp.stack([jnp.asarray(hwio(sd[f"body.{i}.conv1.weight"])) for i in range(L)])},
        "conv2": {"weight": jnp.stack([jnp.asarray(hwio(sd[f"body.{i}.conv2.weight"])) for i in range(L)])},
    }
    if cfg.controllable:
        body["film_w"] = jnp.stack(
            [jnp.asarray(sd[f"body.{i}.film.weight"].T) for i in range(L)]
        )
        body["film_b"] = jnp.stack(
            [jnp.asarray(sd[f"body.{i}.film.bias"]) for i in range(L)]
        )
    return {
        "stem": {
            "conv": {
                "weight": jnp.asarray(hwio(sd["stem.conv.weight"])),
                "bias": jnp.asarray(sd["stem.conv.bias"]),
            }
        },
        "body": body,
        "tail": {"conv": {"weight": jnp.asarray(hwio(sd["tail.conv.weight"]))}},
    }


def test_compare(params, x, c=None, *, cfg, **kw):
    """(enhanced, bicubic) pair — the 0.2.x eval API used by the reference's
    validate.py:97."""
    enhanced = upscale(params, x, c, cfg=cfg, **kw)
    bicubic = jnp.clip(upsample2d(x.astype(jnp.float32), cfg.upscale_ratio), 0.0, 1.0)
    return enhanced, bicubic.astype(x.dtype)
