"""Bounded perf experiment: zero-pad the 4X Ctrl trunk 96 -> 128 channels.

Hypothesis (ARCHITECTURE.md MXU notes): the v5e MXU is 128 lanes wide and
XLA conv at C=96 measured ~56-60% utilisation — if the shortfall is lane
padding, widening the trunk to 128 (with zero weights, mathematically
identical outputs) should reclaim it; if XLA already pads internally, the
padded model pays 1.78x the nominal FLOPs for the same wall time and the
experiment is a documented reject.

The padding construction keeps outputs EXACTLY identical:
* stem: extra output channels have zero weight+bias -> extra trunk
  activations are 0 everywhere;
* body conv1: extra input slots read zeros, extra hidden outputs are 0;
  FiLM gamma/beta padded with zeros (beta=0 keeps new hidden at 0 through
  the affine), SiLU(0)=0;
* body conv2: extra inputs read 0, extra trunk outputs write 0 (residual
  keeps channels 96..127 identically 0 through every layer);
* tail: extra input slots zero-weighted.

Run: python -m ultrazoom_tpu.tools.exp_channel_pad
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.models import ctrl

BATCH, SIZE, ITERS = 8, 512, 10


def pad_ctrl_params(params, cfg: ctrl.MewZoomCtrlConfig, c_new: int):
    """Widen trunk c -> c_new (and hidden h -> c_new*ratio) with zeros;
    outputs are bit-identical modulo float reassociation."""
    c = cfg.num_channels
    h = c * cfg.hidden_ratio
    h_new = c_new * cfg.hidden_ratio
    dc, dh = c_new - c, h_new - h

    def pad(a, spec):
        return jnp.pad(a, [(0, spec.get(i, 0)) for i in range(a.ndim)])

    body = params["body"]
    out = {
        "stem": {
            "conv": {
                "weight": pad(params["stem"]["conv"]["weight"], {3: dc}),
                "bias": pad(params["stem"]["conv"]["bias"], {0: dc}),
            }
        },
        "body": {
            "conv1": {"weight": pad(body["conv1"]["weight"], {3: dc, 4: dh})},
            "conv2": {"weight": pad(body["conv2"]["weight"], {3: dh, 4: dc})},
        },
        "tail": {"conv": {"weight": pad(params["tail"]["conv"]["weight"], {2: dc})}},
    }
    if cfg.controllable:
        # film_w: (L, F, 2H) -> gamma rows then beta rows; pad each half.
        fw, fb = body["film_w"], body["film_b"]
        g_w, b_w = fw[..., :h], fw[..., h:]
        g_b, b_b = fb[..., :h], fb[..., h:]
        out["body"]["film_w"] = jnp.concatenate(
            [pad(g_w, {2: dh}), pad(b_w, {2: dh})], axis=-1
        )
        out["body"]["film_b"] = jnp.concatenate(
            [pad(g_b, {1: dh}), pad(b_b, {1: dh})], axis=-1
        )
    new_cfg = dataclasses.replace(cfg, num_channels=c_new)
    return out, new_cfg


def _time(fn, args, iters=ITERS):
    sync = jax.jit(lambda y: y[0, 0, 0, 0] * 1.0)
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    cfg = ctrl.PRESETS["4x"]
    params = ctrl.init(jax.random.key(0), cfg)
    padded, pcfg = pad_ctrl_params(params, cfg, 128)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    c = jnp.tile(jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32), (BATCH, 1))

    f_base = jax.jit(
        lambda xx, cc: ctrl.upscale(params, xx, cc, cfg=cfg, compute_dtype=jnp.bfloat16)
    )
    f_pad = jax.jit(
        lambda xx, cc: ctrl.upscale(padded, xx, cc, cfg=pcfg, compute_dtype=jnp.bfloat16)
    )

    # Mathematical equivalence is proven exactly in CPU f32
    # (tests/test_tools_smoke.py::test_channel_pad_is_exact_identity_f32).
    # ON DEVICE, both bf16 and "f32" TPU convs round inputs to bf16, and
    # the padded conv's different reduction order changes per-layer
    # roundings that cascade over 40 residual layers to ~1e-2 absolute —
    # a bf16-reassociation property, not a construction error.  Gate on a
    # sanity bound only.
    a = np.asarray(f_base(x[:1], c[:1]))
    b = np.asarray(f_pad(x[:1], c[:1]))
    max_d = float(np.abs(a - b).max())
    assert max_d < 6e-2, f"padding changed outputs beyond bf16 drift: {max_d}"

    dt0 = _time(f_base, (x, c))
    dt1 = _time(f_pad, (x, c))
    mp = BATCH * SIZE * SIZE / 1e6
    print(f"output max delta (bf16 reassociation drift): {max_d:.2e}")
    print(f"base  (96ch):  {dt0 * 1e3:8.2f} ms  {mp / dt0:6.2f} MP/s")
    print(f"padded(128ch): {dt1 * 1e3:8.2f} ms  {mp / dt1:6.2f} MP/s")
    print(
        json.dumps(
            {
                "metric": "ctrl 4X trunk zero-pad 96->128, 512^2 b8 bf16",
                "value": round(mp / dt1, 3),
                "unit": "MP/s",
                "baseline_mps": round(mp / dt0, 3),
                "speedup": round(dt0 / dt1, 3),
                "output_max_delta": max_d,
            }
        )
    )


if __name__ == "__main__":
    main()
