"""HuggingFace-style save/load: ``config.json`` + ``model.safetensors``.

Interop contract: tensors are written in **torch layout** (OIHW kernels)
under the reference's module names, so a directory produced by
``save_pretrained`` is loadable by the original torch package's
``PyTorchModelHubMixin`` path (reference src/ultrazoom/model.py:37,43 — the
mixin persists ctor kwargs as config.json and weights as safetensors), and
vice versa: a directory downloaded from the Hub loads straight into JAX.

Models with non-1:1 parameter layouts (the scan-stacked Ctrl body) provide
``to_torch_flat`` / ``from_torch_flat`` adapters; the U-Net maps through the
generic flatten + transpose.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Mapping

import numpy as np

from ultrazoom_tpu.convert.torch_import import (
    flatten_tree,
    torch_state_dict_to_tree,
)

__all__ = ["save_pretrained", "load_pretrained", "tree_to_torch_flat"]

CONFIG_NAME = "config.json"
WEIGHTS_NAME = "model.safetensors"


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def tree_to_torch_flat(params) -> dict[str, np.ndarray]:
    """Generic pytree -> flat torch-layout state dict (expects materialized
    params; fold weight-norm/LoRA factors before exporting)."""
    flat = flatten_tree(params)
    out = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.ndim == 4 and k.endswith(".weight"):
            arr = _hwio_to_oihw(arr)
        out[k] = arr
    return out


def save_pretrained(
    path: str | pathlib.Path,
    flat_torch_sd: Mapping[str, np.ndarray],
    config: dict[str, Any],
    dtype: str | None = None,
) -> None:
    """Write config.json + model.safetensors (torch tensor layout).

    ``dtype="bfloat16"`` halves the artifact (safetensors carries BF16
    natively; torch and our loaders read it back transparently) — how the
    56M-param flagship ships at ~112 MB instead of 225 MB.
    """
    from safetensors.numpy import save_file

    cast = None
    if dtype in ("bfloat16", "bf16"):
        import ml_dtypes

        cast = ml_dtypes.bfloat16
    elif dtype is not None:
        cast = np.dtype(dtype)

    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    (p / CONFIG_NAME).write_text(json.dumps(config, indent=2))
    save_file(
        {
            k: np.ascontiguousarray(v if cast is None else np.asarray(v).astype(cast))
            for k, v in flat_torch_sd.items()
        },
        str(p / WEIGHTS_NAME),
    )


def load_pretrained(path: str | pathlib.Path):
    """Read (config_dict, flat_torch_state_dict) from an HF-style dir.

    Reduced-precision artifacts (bfloat16/float16 exports) are upcast to
    float32 on load — params are f32 by convention; ``compute_dtype``
    controls the on-device precision.
    """
    from safetensors.numpy import load_file

    p = pathlib.Path(path)
    config = json.loads((p / CONFIG_NAME).read_text())
    sd = load_file(str(p / WEIGHTS_NAME))
    sd = {
        k: v.astype(np.float32)
        if v.dtype.kind in ("f", "V") and v.dtype.itemsize < 4
        else v
        for k, v in sd.items()
    }
    return config, sd


def load_pretrained_tree(path: str | pathlib.Path, **convert_kw):
    """Read an HF-style dir straight into a JAX pytree."""
    config, sd = load_pretrained(path)
    params, sn_state = torch_state_dict_to_tree(sd, **convert_kw)
    return config, params, sn_state
