"""Forensic replay of the epoch-6 adaptive-loss spike (4X Ctrl, seed 146).

Run from the repo root.  Requires the preserved spike checkpoint
(checkpoints/r3_4x_s1_forensic, epoch 4 of the run whose NaN guard
tripped) and the round-3 sample cache (cache_r3/train_4x).

Phase A (default): stock replay of epochs 5-6 from the epoch-4
checkpoint, tracing log_sigmas / grad_norm / pixel_l2 per step through
the spike window.
Phase B (runs after A, or alone with ``--b-only``): identical replay
with log_sigmas pinned to their epoch-4 values after every step
(loss-weight feedback disabled).  A finite phase B with a spiking
phase A pins the runaway on the adaptive combiner's learnable weights
(reference loss.py:96-145), not on the model/optimizer state or the
data.
Phase C (``--c-floor``): the SHIPPED fix — ``sigma_floor=-1.25`` inside
the stock trainer step, no pinning — on the same state + data.

Measured verdict (TPU v5e, 2026-08-17; raw traces in
checkpoints/r3_4x_s1_forensic/experiment*.json):
  A: grad_norm 1.33 -> 1.8e6 (step 51) -> 3.07e9 (step 55), sigmas -1.71
  B: finite, max grad_norm 1.58 over epochs 5-6
  C: finite, max grad_norm 0.45, sigmas held at the floor
See ARCHITECTURE.md "Root-caused: the adaptive-loss (Kendall) runaway".
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.models import ctrl as ctrl_mod
from ultrazoom_tpu.models.ctrl import MewZoomCtrlConfig
from ultrazoom_tpu.train.steps import (
    TrainState,
    make_adaptive_optimizer,
    make_ctrl_pretrain_step,
    wrap_params_with_loss_combiner,
)
from ultrazoom_tpu.train.device_data import (
    epoch_batch_indices,
    make_gather_step,
    upload_cache,
)
from ultrazoom_tpu.data import CachedImageFolder
from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.utils import restore_state

CKPT = "checkpoints/r3_4x_s1_forensic"
SEED = 146
BATCH = 32

cfg = MewZoomCtrlConfig(
    upscale_ratio=4, num_channels=96, num_layers=40, hidden_ratio=2,
    controllable=True, num_control_features=3,
)
params = ctrl_mod.init(jax.random.key(SEED), cfg)
params = wrap_params_with_loss_combiner(params, 3)
optimizer = make_adaptive_optimizer(3e-4, 2.0, 1, 1e-3)
template = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

vgg = init_vgg19_features(None, seed=0)
# --c-floor: phase C — the SHIPPED fix (sigma_floor -1.25) on the stock
# trainer step, no pinning.  Default: the reference's unclamped combiner.
FLOOR = -1.25 if "--c-floor" in sys.argv else None
step_fn = make_ctrl_pretrain_step(
    cfg, optimizer, vgg, compute_dtype=jnp.bfloat16,
    loss_combiner="adaptive", remat="hidden", adaptive_sigma_floor=FLOOR,
)

ds = CachedImageFolder("cache_r3/train_4x")
device_data = upload_cache(ds, None, "replicated")
gather_step = make_gather_step(step_fn, mesh=None)

def batches(epoch_1based):
    return epoch_batch_indices(len(ds), BATCH, SEED, epoch_1based - 1)

def run(pin_sigmas: bool, tag: str):
    state, meta = restore_state(CKPT, template)
    # host copy: each pin below makes a FRESH device array (the previous
    # one is consumed by the step's state donation)
    s0_np = np.asarray(state.params["loss_combiner"]["log_sigmas"]).copy()
    s0 = jnp.asarray(s0_np)
    print(f"[{tag}] restored epoch {meta['epoch']}, log_sigmas {np.asarray(s0)}")
    trace = []
    for epoch in (5, 6):
        for i, idx in enumerate(batches(epoch)):
            state, m = gather_step(state, device_data, idx)
            if pin_sigmas:
                p = dict(state.params)
                p["loss_combiner"] = {"log_sigmas": jnp.asarray(s0_np)}
                state = state._replace(params=p)
            if epoch == 6 or i % 75 == 0:
                sig = np.asarray(state.params["loss_combiner"]["log_sigmas"])
                rec = {
                    "epoch": epoch, "step": i,
                    "grad_norm": float(m["grad_norm"]),
                    "pixel_l2": float(m["pixel_l2"]),
                    "log_sigmas": [round(float(v), 4) for v in sig],
                }
                trace.append(rec)
                if epoch == 6 and (i % 10 == 0 or rec["grad_norm"] > 100):
                    print(f"[{tag}]", rec)
                if rec["grad_norm"] > 1e5 and len([r for r in trace if r["grad_norm"] > 1e5]) > 6:
                    print(f"[{tag}] spike confirmed — stopping early")
                    return trace, True
    return trace, False

if "--c-floor" in sys.argv:
    trace_c, spiked_c = run(False, "C floored")
    out = {"C_floored_spiked": spiked_c, "C_tail": trace_c[-8:]}
    with open("checkpoints/r3_4x_s1_forensic/experiment_c.json", "w") as f:
        json.dump({"C": trace_c, "summary": out}, f, indent=1)
    print(json.dumps(out, indent=1))
else:
    if "--b-only" in sys.argv:
        trace_a, spiked_a = [], True  # phase A recorded in /tmp/forensic.log
    else:
        trace_a, spiked_a = run(False, "A stock")
    trace_b, spiked_b = run(True, "B pinned")
    out = {
        "A_stock_spiked": spiked_a,
        "B_pinned_spiked": spiked_b,
        "A_tail": trace_a[-8:],
        "B_tail": trace_b[-8:],
    }
    with open("checkpoints/r3_4x_s1_forensic/experiment.json", "w") as f:
        json.dump({"A": trace_a, "B": trace_b, "summary": out}, f, indent=1)
    print(json.dumps(out, indent=1))
