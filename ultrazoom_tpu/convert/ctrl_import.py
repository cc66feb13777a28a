"""Shape-driven importer for 0.2.x-era "Ctrl" torch checkpoints.

The published MewZoom-{2,3,4}X[-Ctrl] HF checkpoints use the 0.1.x/0.2.x
architecture whose torch source is absent from the reference snapshot
(SURVEY.md section 0.1) — so their exact module names cannot be known
offline.  This importer ignores key names entirely and reconstructs the
model from tensor *shapes* (the approach SURVEY.md section 7 prescribes):

* stem: the 1x1 conv with 3 input channels -> infers trunk width C.
* body: alternating 3x3 convs (C -> hC) and (hC -> C) in key order ->
  infers hidden ratio and layer count.
* FiLM controls: 2-D (2*hC, k) weights (+ matching biases) -> infers
  controllability and the control-feature count k.
* tail: the 3x3 conv (C -> 3*r^2) -> infers the upscale ratio.

Torch parametrizations are folded FIRST (``fold_parametrizations_flat``):
the reference's 0.2.x load recipe (validate.py:55-65) proves training
checkpoints carry ``parametrizations.weight.original0/original1`` weight-
norm factors (plus optional ChannelLoRA), which would otherwise corrupt the
shape walk (v picked up unnormalised, g dropped).  ``_orig_mod.`` prefixes
are stripped in the same pass.

Returns (params, inferred MewZoomCtrlConfig).  Verified against synthetic
torch checkpoints with unrelated key names, with and without weight norm
(tests/test_ctrl_import.py); when a real HF download is available this is
the entry point:

    sd = safetensors.torch.load_file("model.safetensors")
    params, cfg = import_ctrl_state_dict(sd)
"""

from __future__ import annotations

import math
import re

import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.convert.torch_import import fold_parametrizations_flat
from ultrazoom_tpu.models.ctrl import MewZoomCtrlConfig

__all__ = ["import_ctrl_state_dict"]


def _hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _natural_key(key: str):
    """Digit-aware sort key: ``body.10`` sorts after ``body.2``.

    Layer ORDER is the one thing shapes cannot tell apart (every body layer
    is shape-identical), so it must come from the keys.  torch state dicts
    iterate in registration order, but safetensors files return keys
    ALPHABETICALLY — which scrambles ``body.0, body.1, body.10, ..., body.2``
    for any model deeper than 10 layers.  Natural sorting recovers the true
    index order for both sources (and is a stable no-op for torch-ordered
    dicts with consistent naming).

    Applied only when every body-candidate key embeds a digit (see
    ``import_ctrl_state_dict``): a registration-ordered dict whose layer
    keys carry no numeric index is already in the only recoverable order —
    sorting it would scramble the insertion order for nothing.  (A
    safetensors file with index-free keys is unrecoverable by any rule:
    alphabetical order destroyed the registration order and the keys carry
    no substitute.)"""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", key)]


def import_ctrl_state_dict(
    state_dict, *, lora_alpha: float | None = None
) -> tuple[dict, MewZoomCtrlConfig]:
    """Reconstruct (params, config) from a flat torch state dict by shape.

    ``lora_alpha``: scale for ChannelLoRA deltas if the checkpoint carries
    adapters (torch stores alpha out-of-band in ``ckpt["lora_args"]``).
    """
    flat = fold_parametrizations_flat(state_dict, lora_alpha=lora_alpha)
    # Layer order only matters where shapes are ambiguous: groups of MORE
    # THAN ONE shape-identical 3x3 conv (the body layers; the shape-unique
    # tail conv needs no ordering).  Natural-sort only if every key in such
    # a group carries an embedded index, otherwise trust insertion order
    # (see _natural_key docstring).
    groups: dict[tuple, list[str]] = {}
    for k, v in flat.items():
        if getattr(v, "ndim", 0) == 4 and v.shape[2] == v.shape[3] == 3:
            groups.setdefault(tuple(v.shape), []).append(k)
    ambiguous = [k for ks in groups.values() if len(ks) > 1 for k in ks]
    if ambiguous and all(re.search(r"\d", k) for k in ambiguous):
        items = sorted(flat.items(), key=lambda kv: _natural_key(kv[0]))
    else:
        items = list(flat.items())

    stem_w = stem_b = tail_w = None
    body_convs: list[np.ndarray] = []
    film_ws: list[np.ndarray] = []
    film_bs: list[np.ndarray] = []

    # Pass 1: stem (1x1, 3-in) fixes C.
    for _, v in items:
        if v.ndim == 4 and v.shape[1] == 3 and v.shape[2] == v.shape[3] == 1:
            stem_w = v
            break
    assert stem_w is not None, "no 1x1 stem conv with 3 input channels found"
    c = stem_w.shape[0]

    conv3x3: list[np.ndarray] = []
    for k, v in items:
        if v is stem_w:
            continue
        if v.ndim == 4 and v.shape[2] == v.shape[3] == 3:
            conv3x3.append(v)
        elif v.ndim == 2 and v.shape[1] <= 8:
            film_ws.append(v)
        elif v.ndim == 1 and v.shape[0] == c:
            stem_b = v
        elif v.ndim == 1:
            film_bs.append(v)

    # Tail = the LAST 3x3 conv whose output is 3*r^2 (r in {2, 3, 4}) with
    # trunk-width input.  "Last in key order" disambiguates the corner case
    # where a body conv's hidden width coincides with 3*r^2.
    tail_candidates = [
        i for i, v in enumerate(conv3x3)
        if v.shape[1] == c and v.shape[0] in (12, 27, 48)
    ]
    assert tail_candidates, "no pixel-shuffle tail conv (3*r^2 out) found"
    tail_w = conv3x3.pop(tail_candidates[-1])
    body_convs = conv3x3

    assert stem_b is not None, "no stem bias found"
    ratio = math.isqrt(tail_w.shape[0] // 3)

    # Body: alternate (hC, C) / (C, hC) in order of appearance.
    conv1s = [w for w in body_convs if w.shape[1] == c and w.shape[0] != 3 * ratio**2]
    conv2s = [w for w in body_convs if w.shape[0] == c]
    assert len(conv1s) == len(conv2s) > 0, (
        f"unbalanced body convs: {len(conv1s)} expanding vs {len(conv2s)} reducing"
    )
    hc = conv1s[0].shape[0]
    assert all(w.shape[0] == hc for w in conv1s)
    assert hc % c == 0, (hc, c)

    controllable = bool(film_ws)
    nf = film_ws[0].shape[1] if controllable else 3
    if controllable:
        assert len(film_ws) == len(conv1s), "FiLM count != layer count"
        assert all(w.shape == (2 * hc, nf) for w in film_ws)
        film_bs = [b for b in film_bs if b.shape[0] == 2 * hc]
        assert len(film_bs) == len(film_ws)

    cfg = MewZoomCtrlConfig(
        upscale_ratio=ratio,
        num_channels=c,
        num_layers=len(conv1s),
        hidden_ratio=hc // c,
        controllable=controllable,
        num_control_features=nf,
    )
    body = {
        "conv1": {"weight": jnp.stack([jnp.asarray(_hwio(w)) for w in conv1s])},
        "conv2": {"weight": jnp.stack([jnp.asarray(_hwio(w)) for w in conv2s])},
    }
    if controllable:
        body["film_w"] = jnp.stack([jnp.asarray(w.T) for w in film_ws])
        body["film_b"] = jnp.stack([jnp.asarray(b) for b in film_bs])
    params = {
        "stem": {
            "conv": {
                "weight": jnp.asarray(_hwio(stem_w)),
                "bias": jnp.asarray(stem_b),
            }
        },
        "body": body,
        "tail": {"conv": {"weight": jnp.asarray(_hwio(tail_w))}},
    }
    return params, cfg
