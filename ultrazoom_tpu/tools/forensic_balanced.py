"""Forensic replay of the epoch-4 balanced-combiner spike (56M U-Net, seed 300).

Run from the repo root.  Requires the preserved spike checkpoint
(checkpoints/forensic_balanced_spike — the epoch-2 state of the round-3
``unet_s1`` stage whose NaN guard tripped at epoch 4, step 331, and whose
in-run deterministic replay REPRODUCED the spike bit-exactly; diagnosis in
docs/forensic_balanced/nan_diagnosis.jsonl) and the round-3 sample cache
(cache_r3/train_2x, head-sliced to 12,000 samples like the live run).

Phase A (default): stock replay of epochs 3-4 with the REFERENCE-EXACT
balanced combiner (``balanced_floor=None`` — ``sum(l_i / sg(l_i))``,
reference loss.py:82-93), tracing every loss term + grad_norm per step
through the spike window.  Expected: the spike reproduces, and the trace
shows which term's divisor collapsed first (1/l_i amplification).

Phase C (``--c-floor``): ``balanced_floor=1e-4`` on the identical state +
data.  MEASURED VERDICT: phase C is BIT-IDENTICAL to phase A (every traced
step, to the last digit) — no divisor ever dipped below 1e-4, so the
unbounded-1/l_i hypothesis is REFUTED for this spike.  The floor stays as
defence-in-depth (the analogous adaptive-combiner runaway was real), but it
is not this incident's cause.

Phase D (``--d-lr LR``): identical replay with a constant upscaler lr.
The late-training forensic (forensic_adaptive_late) showed the same
geometry — divergence at 3e-4, stability at 1e-4 on identical state+data —
at epoch 57; this phase tests whether the epoch-4 spike is the same
edge-of-stability divergence arriving early (larger corpus + 56M model
sharpen the landscape sooner).  The trace signature supports it: the
QA/degradation term and grad_norm ramp geometrically with jumps at every
gradient-accumulation boundary (steps 319/323/327/331) while per-term
losses are still healthy — bounded clipped updates compounding in a sharp
eigendirection, not a loss-weight runaway.

Traces land in checkpoints/forensic_balanced_spike/experiment*.json; the
measured verdict is recorded in ARCHITECTURE.md.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ultrazoom_tpu.data import CachedImageFolder
from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.models import unet
from ultrazoom_tpu.train.device_data import (
    epoch_batch_indices,
    make_gather_step,
    upload_cache,
)
from ultrazoom_tpu.train.steps import (
    TrainState,
    make_optimizer,
    make_pretrain_step,
)
from ultrazoom_tpu.utils import restore_state

CKPT = "checkpoints/forensic_balanced_spike"
SEED = 300
BATCH = 32
ACCUM = 4
MAX_SAMPLES = 12_000

# Exact unet_s1 construction (tools/recipes_r3.sh + pretrain.py defaults):
# default MewZoomConfig (48/4, 96/4, 192/4, 384/8, hidden_ratio 2) at 2X,
# balanced combiner, bf16 compute, full-remat activation checkpointing,
# cosine lr over 60 epochs.
cfg = unet.MewZoomConfig(upscale_ratio=2)
params = unet.init(jax.random.key(SEED), cfg)

ds = CachedImageFolder("cache_r3/train_2x", max_samples=MAX_SAMPLES)
updates_per_epoch = max(1, len(ds) // BATCH // ACCUM)
if "--d-lr" in sys.argv:
    # constant_schedule (not a bare float) keeps the optimizer state
    # structure identical to the checkpointed cosine-schedule run.
    D_LR = float(sys.argv[sys.argv.index("--d-lr") + 1])
    lr = optax.constant_schedule(D_LR)
else:
    D_LR = None
    lr = optax.cosine_decay_schedule(3e-4, 60 * updates_per_epoch, alpha=0.1)
optimizer = make_optimizer(lr, 2.0, ACCUM)
template = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

vgg = init_vgg19_features(None, seed=0)
FLOOR = 1e-4 if "--c-floor" in sys.argv else None
step_fn = make_pretrain_step(
    cfg, optimizer, vgg, remat=True, compute_dtype=jnp.bfloat16,
    loss_combiner="balanced", balanced_floor=FLOOR,
)

device_data = upload_cache(ds, None, "replicated")
gather_step = make_gather_step(step_fn, mesh=None, n_samples=len(ds))

TERMS = ("pixel_l2", "vgg22_l2", "vgg54_l2", "degradation_l2", "grad_norm")


def run(tag: str):
    state, meta = restore_state(CKPT, template)
    print(f"[{tag}] restored epoch {meta['epoch']} (floor={FLOOR})")
    trace, spiked = [], False
    for epoch in (3, 4):
        for i, idx in enumerate(
            epoch_batch_indices(len(ds), BATCH, SEED, epoch - 1)
        ):
            state, m = gather_step(state, device_data, idx)
            hot = epoch == 4 and i >= 315
            if hot or i % 75 == 0:
                rec = {"epoch": epoch, "step": i}
                rec.update({k: float(m[k]) for k in TERMS})
                trace.append(rec)
                if hot or i % 150 == 0:
                    print(f"[{tag}]", {k: (round(v, 6) if isinstance(v, float) else v)
                                       for k, v in rec.items()})
                if any(abs(rec[k]) > 1e6 for k in TERMS):
                    spiked = True
                    if len([r for r in trace if any(abs(r[k]) > 1e6 for k in TERMS)]) >= 4:
                        print(f"[{tag}] spike confirmed — stopping early")
                        return trace, True
    return trace, spiked


if D_LR is not None:
    tag, name = f"D lr={D_LR}", "experiment_d.json"
elif FLOOR:
    tag, name = "C floored", "experiment_c.json"
else:
    tag, name = "A stock", "experiment.json"
trace, spiked = run(tag)
out = {"phase": tag, "floor": FLOOR,
       "lr": D_LR if D_LR is not None else "cosine(3e-4, 60ep)",
       "spiked": spiked, "tail": trace[-10:]}
with open(f"{CKPT}/{name}", "w") as f:
    json.dump({"trace": trace, "summary": out}, f, indent=1)
print(json.dumps(out, indent=1))
