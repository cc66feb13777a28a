"""Headline benchmark: megapixels/sec at 4X upscale on one TPU chip.

Config matches BASELINE.json config #3: the 14M-param 4X model
(MewZoom-4X Ctrl architecture, 96ch x 40 layers) on 512x512 inputs,
batch 8, bf16 compute.  ``vs_baseline`` is the ratio to the reference
implementation's measured 0.016 input-MP/s on this task (BASELINE.md —
the reference publishes no numbers of its own; north star is >=5x).

Prints ONE JSON line.

Hang hardening: the tunnel-attached backend occasionally wedges an
in-flight RPC — observed live: a first-compile that normally takes ~25 s
blocked >500 s with no exception, while a fresh process succeeded
immediately (same failure family as train/watchdog.py).  So the
measurement runs in a child process under a deadline and gets ONE fresh
retry; the jax-free parent relays the child's JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

REFERENCE_MPS = 0.016  # BASELINE.md: measured 4X reference throughput (CPU)
BATCH = 8
SIZE = 512
ITERS = 10
CHILD_DEADLINE_S = 420  # >10x the normal first-compile + measure time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultrazoom_tpu.models import ctrl

    cfg = ctrl.PRESETS["4x"]  # 96ch / 40 layers / 4X -> ~14M params
    params = ctrl.init(jax.random.key(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    c = jnp.tile(jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32), (BATCH, 1))

    fn = jax.jit(
        lambda p, xx, cc: ctrl.upscale(p, xx, cc, cfg=cfg, compute_dtype=jnp.bfloat16)
    )
    # A one-scalar readback is the sync barrier: on the tunneled axon
    # backend `block_until_ready` returns before execution finishes, so we
    # chain ITERS calls and force a D2H readback of one output element
    # (compiled once) to close the pipeline.
    sync = jax.jit(lambda y: y[0, 0, 0, 0] * 1.0)
    out = fn(params, x, c)
    float(sync(out))  # warmup/compile both executables

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x, c)
    float(sync(out))
    dt = (time.perf_counter() - t0) / ITERS

    mps = (BATCH * SIZE * SIZE / 1e6) / dt  # input megapixels per second

    print(
        json.dumps(
            {
                "metric": (
                    f"input-MP/s, 4X upscale, {n_params / 1e6:.1f}M-param Ctrl "
                    f"model, {SIZE}x{SIZE} batch {BATCH}, bf16, 1 chip "
                    f"({jax.devices()[0].device_kind})"
                ),
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / REFERENCE_MPS, 1),
            }
        )
    )


def _supervise() -> int:
    """Run main() in a child under a deadline; one fresh-process retry."""
    import os

    here = os.path.abspath(__file__)
    for attempt in (1, 2):
        try:
            proc = subprocess.run(
                [sys.executable, here, "--child"],
                timeout=CHILD_DEADLINE_S,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(here),
            )
        except subprocess.TimeoutExpired as e:
            # Relay whatever the wedged child managed to say — those are
            # exactly the diagnostics worth having.
            err = e.stderr
            if err:
                if isinstance(err, bytes):
                    err = err.decode(errors="replace")
                sys.stderr.write(err)
            print(
                f"bench attempt {attempt}: wedged (> {CHILD_DEADLINE_S} s)"
                + (" — retrying in a fresh process" if attempt == 1 else ""),
                file=sys.stderr,
                flush=True,
            )
            continue
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0:
            sys.stdout.write(proc.stdout)  # the one JSON line
            return 0
        print(
            f"bench attempt {attempt}: child exited {proc.returncode}",
            file=sys.stderr,
            flush=True,
        )
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(_supervise())
