"""Profiling tool: per-op cost analysis + Perfetto/TensorBoard trace.

Reference analog: profile_memory.ipynb (torch.profiler around one forward,
Chrome trace export).  TPU-native: ``jax.profiler.trace`` captures a
Perfetto-compatible trace viewable in TensorBoard or ui.perfetto.dev, and
XLA's compiled cost analysis reports FLOPs / bytes per executable.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU profiler")
    p.add_argument("--model_path", default=None, help="HF dir; default = 4x preset")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trace_dir", default="./exports/traces")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument(
        "--compute_dtype", default="bfloat16", choices=("bfloat16", "float32")
    )
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    if args.model_path:
        from ultrazoom_tpu.models import from_pretrained

        model = from_pretrained(args.model_path)
        fn_raw = lambda x: model.upscale(x, compute_dtype=dtype)  # noqa: E731
        params_info = model.num_params
    else:
        from ultrazoom_tpu.models import ctrl

        cfg = ctrl.PRESETS["4x"]
        params = ctrl.init(jax.random.key(0), cfg)
        params_info = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        fn_raw = jax.jit(
            lambda x: ctrl.upscale(params, x, None, cfg=cfg, compute_dtype=dtype)
        )

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (args.batch, args.size, args.size, 3)),
        jnp.float32,
    )

    # Cost analysis from the compiled executable.
    if hasattr(fn_raw, "lower"):
        compiled = fn_raw.lower(x).compile()
        cost = compiled.cost_analysis()
        if cost:
            flops = cost.get("flops", float("nan"))
            bytes_accessed = cost.get("bytes accessed", float("nan"))
            print(
                f"XLA cost analysis: {flops / 1e9:.2f} GFLOP, "
                f"{bytes_accessed / 1e6:.1f} MB accessed, "
                f"{params_info / 1e6:.1f}M params"
            )

    jax.block_until_ready(fn_raw(x))  # warmup

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            jax.block_until_ready(fn_raw(x))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.block_until_ready(fn_raw(x))
    dt = (time.perf_counter() - t0) / args.iters
    mp = args.batch * args.size * args.size / 1e6
    print(
        f"{dt * 1e3:.2f} ms/iter ({mp / dt:.2f} input-MP/s) on "
        f"{jax.devices()[0].device_kind}; trace written to {args.trace_dir} "
        "(open with TensorBoard or ui.perfetto.dev)"
    )


if __name__ == "__main__":
    main()
