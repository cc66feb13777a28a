"""VGG19 perceptual loss (vgg22 + vgg54 features), JAX implementation.

Reference: loss.py:10-51 — MSE between VGG19 activations of prediction and
target at two depths: ``features[0:9]`` (relu2_2) and ``features[9:36]``
(relu5_4, computed by continuing from the relu2_2 activations).  As in the
reference, inputs are raw [0, 1] images (no ImageNet normalization).

Weights: torchvision's pretrained VGG19 cannot be downloaded in an
air-gapped environment.  The loss therefore loads weights from (first hit
wins):

1. an explicit ``weights_path`` (safetensors file with torchvision's
   ``features.{i}.weight/bias`` keys, OIHW),
2. the ``UZ_VGG19_WEIGHTS`` environment variable,
3. deterministic random init (seeded) — a random-projection perceptual loss;
   training still converges on pixel+degradation losses, and the random
   features still penalise structural error, but results will differ from a
   pretrained-VGG run.  A warning is emitted once.

TPU notes: convs run NHWC/HWIO bf16-able with f32 accumulation; maxpool is
``lax.reduce_window``.  The whole feature stack is one jitted function that
XLA fuses into the training step.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ultrazoom_tpu.ops import conv2d

__all__ = ["VGG19_E_CFG", "init_vgg19_features", "vgg_features", "vgg_loss"]

# VGG-19 "configuration E" feature stack: channel width per conv, "M" = pool.
VGG19_E_CFG = [
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
]

# torchvision features indices: relu2_2 ends the [0:9] slice, relu5_4 the
# [9:36] slice (loss.py:26-27).
_CONV_CHANNELS: list[tuple[int, int]] = []
_c = 3
for _v in VGG19_E_CFG:
    if _v != "M":
        _CONV_CHANNELS.append((_c, _v))
        _c = _v

# Conv positions (0-based in the conv-only list) after which each slice ends:
# convs 0..3 are in vgg22 (conv1_1..conv2_2); convs 4..15 in vgg54.
_N_CONVS_22 = 4
_N_CONVS_54 = 16
# Pools occur after conv indices 1, 3, 7, 11 (pool5 at the very end is
# *outside* features[9:36], which stops at relu5_4).
_POOL_AFTER = {1, 3, 7, 11}


def init_vgg19_features(
    weights_path: str | None = None, seed: int = 0, dtype=jnp.float32
) -> list[dict[str, jax.Array]]:
    """Load or initialise the 16 conv layers of the VGG19 feature stack."""
    path = weights_path or os.environ.get("UZ_VGG19_WEIGHTS")
    if path and os.path.exists(path):
        from safetensors.numpy import load_file

        sd = load_file(path)
        convs = []
        # torchvision indices: conv layers appear at 0,2,5,7,10,... skip relu/pool
        tv_indices = []
        i = 0
        for v in VGG19_E_CFG:
            if v == "M":
                i += 1
            else:
                tv_indices.append(i)
                i += 2
        # Host (numpy) arrays: the frozen weights enter jitted steps as
        # closure constants, and embedding host constants is free, whereas
        # device-resident constants force an ~80 MB D2H read at trace time
        # (fails outright on the tunneled dev backend).
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        for ti in tv_indices[:_N_CONVS_54]:
            w = sd[f"features.{ti}.weight"]  # OIHW
            b = sd[f"features.{ti}.bias"]
            convs.append(
                {
                    "weight": np.ascontiguousarray(
                        np.transpose(w, (2, 3, 1, 0))
                    ).astype(np_dtype),
                    "bias": np.asarray(b, np_dtype),
                }
            )
        return convs

    warnings.warn(
        "VGG19 pretrained weights unavailable — using seeded random features "
        "for the perceptual loss (set UZ_VGG19_WEIGHTS to a safetensors "
        "export of torchvision VGG19 for the reference behaviour).",
        stacklevel=2,
    )
    # Generate on the host CPU backend (same PRNG stream as any device) and
    # return numpy — see the host-constants note above.
    cpu = jax.local_devices(backend="cpu")[0]
    convs = []
    with jax.default_device(cpu):
        key = jax.random.key(seed)
        for n, (cin, cout) in enumerate(_CONV_CHANNELS[:_N_CONVS_54]):
            k = jax.random.fold_in(key, n)
            fan_in = 9 * cin
            w = jax.random.normal(k, (3, 3, cin, cout), dtype) * jnp.sqrt(
                2.0 / fan_in
            )
            convs.append(
                {"weight": np.asarray(w), "bias": np.zeros((cout,), w.dtype)}
            )
    return convs


def _maxpool2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg_features(
    convs: list[dict[str, jax.Array]], x: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Return (relu2_2, relu5_4) activations for NHWC input in [0, 1]."""
    z = x
    f22 = None
    for i, p in enumerate(convs):
        z = conv2d(z, p["weight"], p["bias"], padding=1)
        z = jax.nn.relu(z)
        if i == _N_CONVS_22 - 1:
            f22 = z
        if i in _POOL_AFTER and i < _N_CONVS_54 - 1:
            z = _maxpool2(z)
    return f22, z


def vgg_loss(
    convs: list[dict[str, jax.Array]], y_pred: jax.Array, y: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(vgg22_mse, vgg54_mse), matching reference loss.py:40-51."""
    p22, p54 = vgg_features(convs, y_pred)
    t22, t54 = vgg_features(convs, y)
    t22 = lax.stop_gradient(t22)
    t54 = lax.stop_gradient(t54)
    l22 = jnp.mean((p22.astype(jnp.float32) - t22.astype(jnp.float32)) ** 2)
    l54 = jnp.mean((p54.astype(jnp.float32) - t54.astype(jnp.float32)) ** 2)
    return l22, l54
