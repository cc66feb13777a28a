"""Pytree weight transforms: weight norm, LoRA, spectral norm.

torch expresses these as stateful module "parametrizations"
(src/ultrazoom/model.py:117-139, :1361-1391).  The TPU-native formulation is
a pure function over the parameter pytree: a transformed weight is stored as
a small dict of factor arrays, and :func:`materialize` folds every factor
dict back into plain kernels.  ``materialize`` runs *inside* the jitted
train/inference step, so it is fully differentiable (training sees gradients
w.r.t. g, v, lora_a, ...) and XLA fuses the folding arithmetic into the
convs for free at inference.

Factor-dict encodings (structural, no out-of-band metadata — keeps the tree
a plain jittable pytree):

* weight norm:    ``{"g": (O,), "v": HWIO}``   ->  ``g * v / ||v||_{hwio->o}``
* channel LoRA:   ``{"base": <weight-or-wn-dict>, "lora_a": (kh,kw,O,r),
                    "lora_b": (kh,kw,r,I), "lora_alpha": ()}``
                  ->  ``base + alpha * (A @ B)`` transposed to HWIO
* spectral norm is stateful (power iteration) and lives in
  :func:`spectral_materialize` with an explicit (params, state) signature.

Stacked kernels: a 5-D ``(L, kh, kw, I, O)`` weight (the Ctrl body's
``lax.scan`` layout, models/ctrl.py) is treated as L independent convs —
weight norm uses ``g: (L, O)`` with norms over (kh, kw, I) per (layer, out
channel), LoRA factors gain the leading L axis — so the reference's
"every conv" semantics (src/ultrazoom/model.py:117-129) hold for scan
bodies too, folding the whole stack in one fused op outside the scan.

LoRA factors keep torch's ``ChannelLoRA`` shapes (A: (h, w, out, r),
B: (h, w, r, in), delta = (A @ B).permute to weight layout; reference
src/ultrazoom/model.py:1372-1390) so torch checkpoints convert 1:1.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "materialize",
    "add_weight_norm",
    "remove_weight_norm",
    "add_lora",
    "merge_lora",
    "lora_param_labels",
    "spectral_init_state",
    "spectral_materialize",
]

Params = Any  # nested dict / list pytree of jnp arrays


def _is_wn(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"g", "v"}


def _is_lora(node) -> bool:
    return isinstance(node, dict) and "lora_a" in node and "lora_b" in node


def _fold_wn(node):
    v = node["v"]
    # Norm over the (kh, kw, I) axes — all except the HWIO output axis
    # (== torch dims 1,2,3 of OIHW) and a leading stack axis if 5-D.
    # Computed in f32 for stability regardless of storage dtype.
    v32 = v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v32 * v32, axis=(-4, -3, -2), keepdims=True))
    g = node["g"].astype(jnp.float32)
    g = g.reshape(g.shape[:-1] + (1, 1, 1) + g.shape[-1:])
    return (g * v32 / norm).astype(v.dtype)


def _fold_lora(node):
    base = node["base"]
    w = _fold_wn(base) if _is_wn(base) else base
    # (...,h,w,O,r) @ (...,h,w,r,I) -> (...,h,w,I,O) = (stacked) HWIO
    delta = jnp.einsum("...or,...ri->...io", node["lora_a"], node["lora_b"])
    return w + node["lora_alpha"].astype(w.dtype) * delta.astype(w.dtype)


def materialize(params: Params) -> Params:
    """Fold every factor-dict weight in the tree into a plain kernel."""

    def rec(node):
        if _is_lora(node):
            return _fold_lora(node)
        if _is_wn(node):
            return _fold_wn(node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(params)


def _map_weights(params: Params, fn) -> Params:
    """Apply ``fn`` to every leaf stored under a ``"weight"`` key."""

    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "weight":
                    out[k] = fn(v)
                else:
                    out[k] = rec(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(params)


def add_weight_norm(params: Params) -> Params:
    """Reparametrize every conv weight as (g, v), torch ``weight_norm`` style.

    g is initialized to ||w|| per output channel so the transform is an
    exact identity at the point of application (as in torch).
    """

    def to_wn(w):
        if _is_wn(w) or _is_lora(w):
            return w
        w32 = w.astype(jnp.float32)
        g = jnp.sqrt(jnp.sum(w32 * w32, axis=(-4, -3, -2))).astype(w.dtype)
        return {"g": g, "v": w}

    return _map_weights(params, to_wn)


def remove_weight_norm(params: Params) -> Params:
    """Fold (g, v) pairs back to plain kernels (torch
    ``remove_parametrizations`` equivalent)."""
    return materialize(params)


def add_lora(params: Params, rank: int, alpha: float, key: jax.Array) -> Params:
    """Attach ChannelLoRA factors to every conv weight.

    A ~ N(0, 1)/sqrt(rank), B = 0 (so the adapter starts as identity);
    reference: src/ultrazoom/model.py:1372-1376.
    """
    assert rank > 0 and alpha > 0.0
    counter = [0]

    def to_lora(w):
        if _is_lora(w):
            return w
        base = w["v"] if _is_wn(w) else w
        *lead, kh, kw, i, o = base.shape
        k = jax.random.fold_in(key, counter[0])
        counter[0] += 1
        lora_a = (
            jax.random.normal(k, (*lead, kh, kw, o, rank), jnp.float32)
            / math.sqrt(rank)
        ).astype(base.dtype)
        lora_b = jnp.zeros((*lead, kh, kw, rank, i), base.dtype)
        return {
            "base": w,
            "lora_a": lora_a,
            "lora_b": lora_b,
            "lora_alpha": jnp.asarray(alpha, base.dtype),
        }

    return _map_weights(params, to_lora)


def merge_lora(params: Params) -> Params:
    """Fold LoRA deltas into the base weights (inference deployment)."""
    return materialize(params)


def lora_param_labels(params: Params) -> Params:
    """Label tree for optax.multi_transform: "lora" for adapter factors
    (lora_a / lora_b), "frozen" for everything else.  Matches the reference
    fine-tuning recipe where only adapters train once attached."""

    def rec(node, label):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("lora_a", "lora_b"):
                    out[k] = rec(v, "lora")
                else:
                    out[k] = rec(v, label)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, label) for v in node)
        return label

    return rec(params, "frozen")


# ---------------------------------------------------------------------------
# Spectral norm (critic only) — stateful power iteration.
# ---------------------------------------------------------------------------


def _flatten_out_first(w: jax.Array) -> jax.Array:
    """HWIO -> (O, kh*kw*I), matching torch's (out, -1) reshape of OIHW."""
    kh, kw, i, o = w.shape
    return jnp.transpose(w, (3, 0, 1, 2)).reshape(o, kh * kw * i)


def spectral_init_state(
    params: Params, key: jax.Array, should_norm=lambda path: True
) -> Params:
    """Per-weight left singular vector estimates ``u``, N(0,1)-normalised.

    Mirrors torch ``spectral_norm``'s buffer layout: one u of shape (O,)
    per parametrized weight.  Returned tree has the same dict/list structure
    as ``params`` with a ``u`` array wherever there is a normed weight and
    ``None`` elsewhere.  ``should_norm(path_tuple)`` selects which weights
    participate (e.g. the Bouncer excludes ARM gate convs).
    """
    counter = [0]

    def rec(node, path):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "weight" and should_norm(path + (k,)):
                    w = v["v"] if _is_wn(v) else v
                    o = w.shape[-1]
                    kk = jax.random.fold_in(key, counter[0])
                    counter[0] += 1
                    u = jax.random.normal(kk, (o,), jnp.float32)
                    out[k] = u / jnp.linalg.norm(u)
                elif k == "weight":
                    out[k] = None
                else:
                    out[k] = rec(v, path + (k,))
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, path + (i,)) for i, v in enumerate(node))
        return None

    return rec(params, ())


def spectral_materialize(
    params: Params,
    state: Params,
    update: bool = True,
    eps: float = 1e-12,
    n_iters: int = 1,
) -> tuple[Params, Params]:
    """Divide every weight by its estimated spectral norm.

    One power-iteration step per call when ``update`` (torch default), with
    stop_gradient on u/v exactly as torch detaches its buffers.  Returns
    (materialized_params, new_state).
    """

    def norm(x):
        return x / (jnp.linalg.norm(x) + eps)

    def rec(p_node, s_node):
        if isinstance(p_node, dict):
            p_out, s_out = {}, {}
            for k, v in p_node.items():
                if k == "weight":
                    u = s_node[k] if isinstance(s_node, dict) else None
                    if u is None:
                        p_out[k] = v
                        if isinstance(s_node, dict):
                            s_out[k] = None
                        continue
                    w = materialize(v) if isinstance(v, dict) else v
                    mat = _flatten_out_first(w.astype(jnp.float32))
                    if update:
                        for _ in range(n_iters):
                            vv = norm(mat.T @ u)
                            u = norm(mat @ vv)
                    else:
                        vv = norm(mat.T @ u)
                    u = jax.lax.stop_gradient(u)
                    vv = jax.lax.stop_gradient(vv)
                    sigma = jnp.dot(u, mat @ vv)
                    p_out[k] = (w.astype(jnp.float32) / sigma).astype(w.dtype)
                    s_out[k] = u
                else:
                    pr, sr = rec(v, s_node[k] if isinstance(s_node, dict) else s_node)
                    p_out[k], s_out[k] = pr, sr
            return p_out, s_out
        if isinstance(p_node, (list, tuple)):
            pairs = [rec(pv, sv) for pv, sv in zip(p_node, s_node)]
            return (
                type(p_node)(p for p, _ in pairs),
                type(p_node)(s for _, s in pairs),
            )
        return p_node, s_node

    return rec(params, state)
