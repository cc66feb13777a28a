"""torch state-dict -> JAX pytree conversion.

Handles every serialization quirk of the reference checkpoints
(SURVEY.md section 2.1 "cross-cutting mechanisms"):

* ``_orig_mod.`` prefixes left by ``torch.compile`` (reference strips them in
  every loader, e.g. fine-tune.py:180-182).
* weight-norm parametrizations: ``<mod>.parametrizations.weight.original0``
  (g, shape (O,1,1,1)) + ``original1`` (v, OIHW) -> ``{"g": (O,), "v": HWIO}``
  factor dicts (or folded to a plain kernel with ``fold=True``).
* ChannelLoRA parametrizations: ``parametrizations.weight.<n>.lora_a/_b``
  (already in (h, w, O, r) / (h, w, r, I) layout — reference
  src/ultrazoom/model.py:1372-1376 — which is exactly what
  ``nn.transforms.materialize`` consumes, so no transpose).  ``alpha`` is a
  plain attribute in torch (absent from state dicts); pass ``lora_alpha``.
* spectral-norm parametrizations: ``parametrizations.weight.original`` +
  ``.0._u`` / ``.0._v`` buffers -> plain weight + u state tree.
* layout: 4-D ``*.weight``/``v`` tensors transpose OIHW -> HWIO; everything
  else (biases, ARM alphas, log_sigmas, ...) passes through.  No
  output-channel permutation is needed anywhere — our NHWC pixel_shuffle
  keeps torch's channel ordering (see ops/shuffle.py).

Key paths map to the pytree structurally: ``a.b.3.c`` ->
``tree["a"]["b"][3]["c"]`` with numeric components materialized as lists.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

__all__ = [
    "strip_compile_prefix",
    "fold_parametrizations_flat",
    "torch_state_dict_to_tree",
    "flatten_tree",
    "unflatten_to_lists",
]

_PARAM_RE = re.compile(
    r"^(?P<mod>.*)\.parametrizations\.(?P<pname>[^.]+)\.(?P<rest>.+)$"
)


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (avoid importing torch at module scope: inference-only
    # installs don't need it).
    return t.detach().cpu().numpy()


def strip_compile_prefix(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Drop ``_orig_mod.`` segments injected by ``torch.compile``."""
    return {k.replace("_orig_mod.", ""): v for k, v in sd.items()}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set_path(tree: dict, path: list[str], value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _collect_parametrizations(sd: dict[str, np.ndarray]):
    """Group parametrization keys by (module, param-name).

    Returns (plain_entries, param_groups) where param_groups maps
    ``mod -> {"original0": ..., "0.lora_a": ..., ...}``.
    """
    plain: dict[str, np.ndarray] = {}
    groups: dict[tuple[str, str], dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        m = _PARAM_RE.match(key)
        if m:
            groups.setdefault((m.group("mod"), m.group("pname")), {})[
                m.group("rest")
            ] = val
        else:
            plain[key] = val
    return plain, groups


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """g * v / ||v||, norms over all non-output dims — torch weight_norm
    dim=0 (OIHW dims (1,2,3) for convs; dim 1 for Linear weights)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(v.dtype)


def fold_parametrizations_flat(
    state_dict: Mapping[str, Any], *, lora_alpha: float | None = None
) -> dict[str, np.ndarray]:
    """Fold every torch parametrization into a plain tensor, keeping torch
    layout (OIHW convs) and flat dotted keys.

    Pre-processing pass for shape-driven importers (convert/ctrl_import.py).
    The reference's 0.2.x load path proves its training checkpoints are
    SAVED in parametrized form (validate.py:55-65: ``add_weight_norms()`` ->
    ``load_state_dict()`` -> ``remove_parameterizations()``), so any
    importer that walks raw keys must first fold

    * weight norm: ``parametrizations.weight.original0`` (g) +
      ``.original1`` (v)  ->  ``g * v / ||v||`` (what torch's
      ``remove_parametrizations(leave_parametrized=True)`` materializes),
    * ChannelLoRA: ``.{n}.lora_a/_b`` factor pairs (delta =
      ``(A @ B).permute(2,3,0,1)``, reference src/ultrazoom/model.py:1388),
    * spectral norm: ``.original`` kept as-is, power-iteration ``._u``/
      ``._v`` buffers dropped (critic-only; generators never carry it),

    and strip ``_orig_mod.`` torch.compile prefixes.
    """
    sd = {k: _to_numpy(v) for k, v in strip_compile_prefix(state_dict).items()}
    plain, groups = _collect_parametrizations(sd)
    for (mod, pname), entries in groups.items():
        if "original0" in entries and "original1" in entries:
            w = _fold_weight_norm(entries["original0"], entries["original1"])
        elif "original" in entries:
            w = entries["original"]
        else:
            raise ValueError(
                f"Unrecognized parametrization layout at {mod}.{pname}: "
                f"{sorted(entries)}"
            )
        lora_keys = sorted(k for k in entries if k.endswith(".lora_a"))
        if lora_keys:
            idx = lora_keys[0][: -len(".lora_a")]
            a = entries[f"{idx}.lora_a"]  # (kh, kw, out, r)
            b = entries[f"{idx}.lora_b"]  # (kh, kw, r, in)
            alpha = 1.0 if lora_alpha is None else float(lora_alpha)
            delta = np.einsum("hwor,hwri->oihw", a, b)
            w = w + alpha * delta.astype(w.dtype)
        plain[f"{mod}.{pname}"] = w
    return plain


def torch_state_dict_to_tree(
    state_dict: Mapping[str, Any],
    *,
    fold: bool = True,
    lora_alpha: float | None = None,
    dtype=np.float32,
) -> tuple[dict, dict]:
    """Convert a torch state dict into (params_tree, spectral_state_tree).

    Args:
        state_dict: torch ``Module.state_dict()`` (tensors or numpy arrays).
        fold: fold weight-norm/LoRA factors into plain kernels (inference
            deployment, matching the reference's ``remove_parameterizations``
            load path).  With ``fold=False`` the factor dicts are kept for
            continued training.
        lora_alpha: scale for LoRA deltas (torch stores it out-of-band in the
            checkpoint's ``lora_args``).
        dtype: output dtype for all arrays.

    Returns (params, spectral_u_state); the latter is ``{}`` unless the
    checkpoint has spectral-norm parametrizations (critics).
    """
    sd = {k: _to_numpy(v) for k, v in strip_compile_prefix(state_dict).items()}
    plain, groups = _collect_parametrizations(sd)

    flat_params: dict[str, Any] = {}
    flat_state: dict[str, Any] = {}

    for key, val in plain.items():
        if val.ndim == 4 and key.endswith(".weight"):
            val = _oihw_to_hwio(val)
        flat_params[key] = val.astype(dtype)

    for (mod, pname), entries in groups.items():
        path = f"{mod}.{pname}"
        has_wn = "original0" in entries and "original1" in entries
        lora_keys = sorted(k for k in entries if k.endswith(".lora_a"))
        sn_keys = [k for k in entries if k.endswith("._u")]

        if has_wn:
            g = entries["original0"].reshape(-1)
            v = entries["original1"]
            base: Any
            if fold:
                base = _oihw_to_hwio(_fold_weight_norm(entries["original0"], v))
            else:
                base = {
                    "g": g.astype(dtype),
                    "v": _oihw_to_hwio(v).astype(dtype),
                }
        elif "original" in entries:
            base = _oihw_to_hwio(entries["original"]).astype(dtype)
        else:
            raise ValueError(f"Unrecognized parametrization layout at {path}: {sorted(entries)}")

        if lora_keys:
            idx = lora_keys[0][: -len(".lora_a")]
            lora_a = entries[f"{idx}.lora_a"].astype(dtype)
            lora_b = entries[f"{idx}.lora_b"].astype(dtype)
            alpha = 1.0 if lora_alpha is None else float(lora_alpha)
            if fold:
                if isinstance(base, dict):
                    g32 = base["g"].astype(np.float64).reshape(1, 1, 1, -1)
                    v64 = base["v"].astype(np.float64)
                    nrm = np.sqrt((v64**2).sum(axis=(0, 1, 2), keepdims=True))
                    base = (g32 * v64 / nrm).astype(dtype)
                delta = np.einsum("hwor,hwri->hwio", lora_a, lora_b)
                base = (base + alpha * delta).astype(dtype)
            else:
                base = {
                    "base": base,
                    "lora_a": lora_a,
                    "lora_b": lora_b,
                    "lora_alpha": np.asarray(alpha, dtype),
                }

        if sn_keys:
            idx = sn_keys[0][: -len("._u")]
            flat_state[path] = entries[f"{idx}._u"].astype(np.float32)

        flat_params[path] = base

    return unflatten_to_lists(flat_params), unflatten_to_lists(flat_state)


def unflatten_to_lists(flat: Mapping[str, Any]) -> dict:
    """``{"a.b.0.c": x}`` -> nested dicts, numeric levels become lists."""
    tree: dict = {}
    for key, val in flat.items():
        _set_path(tree, key.split("."), val)

    def listify(node):
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            if node and all(k.isdigit() for k in node):
                return [node[str(i)] for i in range(len(node))]
        return node

    return listify(tree)


def flatten_tree(tree, prefix: str = "") -> dict[str, Any]:
    """Inverse of :func:`unflatten_to_lists` (dotted keys, list indices)."""
    out: dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tree
    return out
