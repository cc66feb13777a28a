"""Measure lax.scan partial unrolling of the Ctrl body at the headline
inference config (4X preset, 512x512 batch 8, bf16, one chip).

Full unrolling of the 40-layer body never finished compiling through the
remote-compile tunnel (ARCHITECTURE.md); this sweeps small partial-unroll
factors, which keep the loop body x-times larger but still O(1) in depth,
to see whether XLA buys anything from cross-layer fusion freedom.

Run:  python -m ultrazoom_tpu.tools.exp_unroll [--unrolls 1,2,4] [--iters 10]
Prints one JSON line per factor: {"unroll": u, "ms": ..., "mps": ...,
"compile_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
SIZE = 512


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", default="1,2,4")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from ultrazoom_tpu.models import ctrl

    cfg = ctrl.PRESETS["4x"]
    params = ctrl.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    c = jnp.tile(jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32), (BATCH, 1))
    sync = jax.jit(lambda y: y[0, 0, 0, 0] * 1.0)

    for u in [int(s) for s in args.unrolls.split(",")]:
        fn = jax.jit(
            lambda p, xx, cc, _u=u: ctrl.upscale(
                p, xx, cc, cfg=cfg, compute_dtype=jnp.bfloat16, unroll=_u
            )
        )
        t0 = time.perf_counter()
        out = fn(params, x, c)
        float(sync(out))  # compile + warmup, pipeline closed by D2H readback
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, x, c)
        float(sync(out))
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "unroll": u,
                    "ms": round(dt * 1e3, 1),
                    "mps": round((BATCH * SIZE * SIZE / 1e6) / dt, 3),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
