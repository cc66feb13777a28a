"""Forensic replay of the LATE-STAGE adaptive-recipe divergence (4X Ctrl,
seed 300, epochs 40/51/57 — WITH the round-3 log-sigma floor active).

Background: the floor (forensic_adaptive.py) killed the early sigma-feedback
runaway, but the round-3 4X stage-1 run still diverged late (guard trips at
epochs 40, 51, 51, 57; every deterministic replay REPRODUCED — a state-
dependent instability, not a transient; the poisoned batches share zero
sample indices, ruling out data poisoning).  The trip witness only fires
at metric > 1e6, and the recorded per-step metrics (pixel_l2 1573 at the
witness step) show the forward had already exploded — the onset is
EARLIER and gradual.

Run from the repo root.  Requires the preserved epoch-56 checkpoint
(checkpoints/r3_4x_s1_late_forensic) + cache_r3/train_4x.

Phase D (default): faithful replay of epoch 57 (data_seed 300 + 3 rewinds
x 1000003, accum 4, bf16, floor -1.25) tracing grad_norm / pixel_l2 /
log_sigmas / model-param global norm EVERY step — localises the onset and
its shape.
Phase E (``--f32``): identical replay with float32 compute.  Stable => the
instability is bf16-precision-dependent; spiking => optimization-dynamics.
Phase F (``--lr 1e-4`` etc.): lr sensitivity on the same state + data.

Results are appended to
checkpoints/r3_4x_s1_late_forensic/experiment_late.jsonl.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.data import CachedImageFolder
from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.models import ctrl as ctrl_mod
from ultrazoom_tpu.models.ctrl import MewZoomCtrlConfig
from ultrazoom_tpu.train.device_data import (
    epoch_batch_indices,
    make_gather_step,
    upload_cache,
)
from ultrazoom_tpu.train.steps import (
    TrainState,
    make_adaptive_optimizer,
    make_ctrl_pretrain_step,
    wrap_params_with_loss_combiner,
)
from ultrazoom_tpu.utils import restore_state

CKPT = "checkpoints/r3_4x_s1_late_forensic"
SEED = 300
REWINDS = 3  # guard generation in force when epoch 57 ran
DATA_SEED = SEED + REWINDS * 1_000_003
BATCH = 32
ACCUM = 4
EPOCH = 57  # 1-based; ckpt is epoch 56

cfg = MewZoomCtrlConfig(
    upscale_ratio=4, num_channels=96, num_layers=40, hidden_ratio=2,
    controllable=True, num_control_features=3,
)

lr = 3e-4
if "--lr" in sys.argv:
    lr = float(sys.argv[sys.argv.index("--lr") + 1])
compute_dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
tag = f"lr{lr:g}-{'f32' if compute_dtype == jnp.float32 else 'bf16'}"

params = wrap_params_with_loss_combiner(ctrl_mod.init(jax.random.key(0), cfg), 3)
optimizer = make_adaptive_optimizer(lr, 2.0, ACCUM, 1e-3)
template = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

step_fn = make_ctrl_pretrain_step(
    cfg, optimizer, init_vgg19_features(None, seed=0),
    compute_dtype=compute_dtype, loss_combiner="adaptive", remat="hidden",
    adaptive_sigma_floor=-1.25,
)

ds = CachedImageFolder("cache_r3/train_4x")
device_data = upload_cache(ds, None, "replicated")
gather_step = make_gather_step(step_fn, mesh=None)

state, meta = restore_state(CKPT, template)
sig0 = np.asarray(state.params["loss_combiner"]["log_sigmas"])
print(f"[{tag}] restored epoch {meta['epoch']}, log_sigmas {sig0}")


def pnorm(state):
    return float(
        jnp.sqrt(
            sum(
                jnp.sum(jnp.square(l.astype(jnp.float32)))
                for l in jax.tree.leaves(state.params["model"])
            )
        )
    )


trace = []
spiked_at = None
for i, idx in enumerate(
    epoch_batch_indices(len(ds), BATCH, DATA_SEED, EPOCH - 1)
):
    state, m = gather_step(state, device_data, idx)
    rec = {
        "step": i,
        "grad_norm": float(m["grad_norm"]),
        "pixel_l2": float(m["pixel_l2"]),
        "sig": [round(float(v), 4) for v in
                np.asarray(state.params["loss_combiner"]["log_sigmas"])],
    }
    if i % 25 == 0 or rec["grad_norm"] > 10 or rec["pixel_l2"] > 1:
        rec["param_norm"] = pnorm(state)
    trace.append(rec)
    if i % 25 == 0 or rec["grad_norm"] > 10:
        print(f"[{tag}]", rec)
    if rec["grad_norm"] > 1e6 and spiked_at is None:
        spiked_at = i
    if spiked_at is not None and i > spiked_at + 8:
        print(f"[{tag}] spike confirmed at step {spiked_at} — stopping")
        break

out = {"tag": tag, "epoch": EPOCH, "spiked_at": spiked_at,
       "onset": [r for r in trace if r["grad_norm"] > 4][:12],
       "tail": trace[-6:]}
with open(f"{CKPT}/experiment_late.jsonl", "a") as f:
    f.write(json.dumps({"summary": out, "trace": trace}) + "\n")
print(json.dumps(out, indent=1))
