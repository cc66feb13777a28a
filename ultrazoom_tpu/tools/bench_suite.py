"""Full benchmark suite over the BASELINE.json scenario list.

Scenarios (BASELINE.json "configs"):
  1. 2X Ctrl preset (1.8M) — 256x256, batch 1
  2. 3X Ctrl preset (3.5M) — 512x512, batch 4
  3. 4X Ctrl preset (14M)  — 512x512, batch 8      (== bench.py headline)
  4. 2X Ctrl — ControlVector sweep (conditioning responds; throughput)
  5. 4X Ctrl — 4K -> 8K... wait, 4X of 4K is 16K; scenario is a 4K-input
     overlap-tile stream through fixed-shape compiled tiles.
  6. (extra) 0.3.0 U-Net default config 2X — 256x256, batch 1

Timing uses chained dispatch + one-scalar readback (see bench.py for why
block_until_ready alone is insufficient on the tunneled backend).
Prints one JSON line per scenario plus a human table.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, args, iters=8):
    sync = jax.jit(lambda y: y[(0,) * (y.ndim - 1) + (0,)] * 1.0)
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / iters


def bench_ctrl(
    preset, size, batch, iters=8, compute_dtype=jnp.bfloat16, controllable=True,
    dispatch=False,
):
    import dataclasses

    from ultrazoom_tpu.models import ctrl

    cfg = dataclasses.replace(ctrl.PRESETS[preset], controllable=controllable)
    params = ctrl.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)), jnp.float32)
    c = (
        jnp.tile(jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32), (batch, 1))
        if controllable
        else None
    )
    fn = jax.jit(
        lambda p, xx, cc: ctrl.upscale(p, xx, cc, cfg=cfg, compute_dtype=compute_dtype)
    )
    if dispatch:
        # Production path (models/api.py upscale): intermediate batches are
        # decomposed into the known-fast anchor shapes instead of compiling
        # a per-batch graph that XLA may pessimise (engine/batching.py).
        from ultrazoom_tpu.engine.batching import dispatch_batched

        call = lambda xx: dispatch_batched(
            lambda xs, cs: fn(params, xs, cs), xx, c
        )
    else:
        call = lambda xx: fn(params, xx, c)
    dt = _time_fn(call, (x,), iters)
    return dt, batch * size * size / 1e6


def bench_serving(n_images=8, size=1024, iters=1):
    """Dynamic-batching service throughput: concurrent mixed-size requests
    share fixed-shape uint8 device batches (engine/serve.py)."""
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.engine.serve import UpscaleService

    cfg = ctrl.PRESETS["4x"]
    params = ctrl.init(jax.random.key(0), cfg)

    def fn(x):
        cc = jnp.broadcast_to(jnp.asarray([[0.5, 0.2, 0.3]]), (x.shape[0], 3))
        return ctrl.upscale(params, x, cc, cfg=cfg, compute_dtype=jnp.bfloat16)

    svc = UpscaleService(
        fn, scale=4, tile=256, overlap=16, tile_batch=8, max_wait_ms=5.0,
        output_dtype="uint8",
    )
    try:
        rng = np.random.default_rng(0)
        imgs = [
            rng.uniform(0, 1, (size, size - 64 * (i % 3), 3)).astype(np.float32)
            for i in range(n_images)
        ]
        svc.upscale(imgs[0])  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            futs = [svc.submit(im) for im in imgs]
            for f in futs:
                f.result()
        dt = (time.perf_counter() - t0) / iters
        mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    finally:
        svc.close()
    return dt, mp


def bench_unet(size, batch, iters=4, compute_dtype=jnp.bfloat16):
    from ultrazoom_tpu.models import unet

    cfg = unet.MewZoomConfig(upscale_ratio=2)
    params = unet.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)), jnp.float32)
    fn = jax.jit(lambda p, xx: unet.upscale(p, xx, cfg, compute_dtype=compute_dtype))
    dt = _time_fn(lambda xx: fn(params, xx), (x,), iters)
    return dt, batch * size * size / 1e6


def bench_tiled_4k(iters=1):
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.engine import TiledUpscaler

    cfg = ctrl.PRESETS["4x"]
    params = ctrl.init(jax.random.key(0), cfg)
    c = jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32)

    def fn(x):
        cc = jnp.broadcast_to(c, (x.shape[0], 3))
        return ctrl.upscale(params, x, cc, cfg=cfg, compute_dtype=jnp.bfloat16)

    # uint8 device-side quantisation: the 16K output is ~1.6 GB in f32;
    # shipping it as uint8 (what an image file needs anyway) is 4x less D2H.
    eng = TiledUpscaler(
        fn, scale=4, tile=256, overlap=16, tile_batch=8, output_dtype="uint8"
    )
    img = np.random.default_rng(0).uniform(0, 1, (2160, 3840, 3)).astype(np.float32)
    out = eng(img)  # warmup (compiles the tile graph)
    assert out.shape == (8640, 15360, 3) and out.dtype == np.uint8
    t0 = time.perf_counter()
    for _ in range(iters):
        eng(img)
    dt = (time.perf_counter() - t0) / iters
    return dt, img.shape[0] * img.shape[1] / 1e6


def bench_tiled_4k_compute(iters=1):
    """Compute-only 4K->16K stream: the EXACT tile geometry TiledUpscaler
    uses (plan_tiles/extract_tiles, tile 256 / overlap 16 / batch 8, uint8
    quantisation in-graph), but every SR tile reduces to one scalar on
    device and the whole stream closes with a single readback.  Isolates
    engine + compute throughput from output D2H (VERDICT r3 Weak #3: the
    stitched-output number measures the dev tunnel's ~40 MB/s link, not
    the engine — a 4X 4K stream's uint8 output is ~350 MB)."""
    from ultrazoom_tpu.engine.tiling import extract_tiles, plan_tiles
    from ultrazoom_tpu.models import ctrl

    cfg = ctrl.PRESETS["4x"]
    params = ctrl.init(jax.random.key(0), cfg)
    c = jnp.asarray([[0.5, 0.2, 0.3]], jnp.float32)
    scale, tile, overlap, tile_batch = 4, 256, 16, 8
    ovs, cores = overlap * scale, (tile - 2 * overlap) * scale

    @jax.jit
    def tile_sums(x):
        cc = jnp.broadcast_to(c, (x.shape[0], 3))
        y = ctrl.upscale(params, x, cc, cfg=cfg, compute_dtype=jnp.bfloat16)
        y = y[:, ovs : ovs + cores, ovs : ovs + cores, :]
        y = jnp.round(jnp.clip(y.astype(jnp.float32), 0, 1) * 255.0)
        return jnp.sum(y, axis=(1, 2, 3))  # one scalar per tile

    img = np.random.default_rng(0).uniform(0, 1, (2160, 3840, 3)).astype(np.float32)
    plan = plan_tiles(img.shape, scale, tile, overlap)
    tiles = extract_tiles(img, plan)
    n = plan.num_tiles
    pad = (-n) % tile_batch
    batches = np.concatenate([tiles, np.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
    batches = batches.reshape(-1, tile_batch, tile, tile, 3)

    def stream():
        outs = [tile_sums(jnp.asarray(b)) for b in batches]
        return float(jnp.sum(jnp.stack(outs)))  # ONE scalar readback

    total = stream()  # warmup/compile
    assert np.isfinite(total) and total > 0
    t0 = time.perf_counter()
    for _ in range(iters):
        stream()
    dt = (time.perf_counter() - t0) / iters
    return dt, img.shape[0] * img.shape[1] / 1e6


def bench_serving_compute(n_images=8, size=1024, iters=1):
    """Compute-only serving throughput: the full UpscaleService machinery
    (queue, cross-request dynamic batching, per-request completion) with
    the benchmark core_sink — each tile's SR is computed and cropped on
    device but only one scalar per tile is read back."""
    from ultrazoom_tpu.engine.serve import UpscaleService
    from ultrazoom_tpu.models import ctrl

    cfg = ctrl.PRESETS["4x"]
    params = ctrl.init(jax.random.key(0), cfg)

    def fn(x):
        cc = jnp.broadcast_to(jnp.asarray([[0.5, 0.2, 0.3]]), (x.shape[0], 3))
        return ctrl.upscale(params, x, cc, cfg=cfg, compute_dtype=jnp.bfloat16)

    svc = UpscaleService(
        fn, scale=4, tile=256, overlap=16, tile_batch=8, max_wait_ms=5.0,
        output_dtype="uint8", core_sink=True,
    )
    try:
        rng = np.random.default_rng(0)
        imgs = [
            rng.uniform(0, 1, (size, size - 64 * (i % 3), 3)).astype(np.float32)
            for i in range(n_images)
        ]
        svc.upscale(imgs[0])  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            futs = [svc.submit(im) for im in imgs]
            for f in futs:
                f.result()
        dt = (time.perf_counter() - t0) / iters
        mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    finally:
        svc.close()
    return dt, mp


def bench_control_sweep():
    """Scenario 4: grid of control vectors; verifies conditioning changes
    the output and measures per-setting latency."""
    from ultrazoom_tpu.models import ctrl

    cfg = ctrl.PRESETS["2x"]
    params = ctrl.init(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 256, 256, 3)), jnp.float32
    )
    fn = jax.jit(
        lambda p, xx, cc: ctrl.upscale(p, xx, cc, cfg=cfg, compute_dtype=jnp.bfloat16)
    )
    grid = [(b, n, j) for b in (0.0, 1.0) for n in (0.0, 1.0) for j in (0.0, 1.0)]
    jax.block_until_ready(fn(params, x, jnp.zeros((1, 3))))  # compile
    outs = []
    t0 = time.perf_counter()
    for b, n, j in grid:
        cc = jnp.asarray([[b, n, j]], jnp.float32)
        outs.append(fn(params, x, cc))
    float(outs[-1][0, 0, 0, 0])  # close the pipeline
    dt = (time.perf_counter() - t0) / len(grid)
    ref = np.asarray(outs[0])
    deltas = [float(np.abs(np.asarray(o) - ref).max()) for o in outs[1:]]
    assert min(deltas) > 0, "control conditioning had no effect"
    return dt, 256 * 256 / 1e6, min(deltas), max(deltas)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--skip_4k", action="store_true")
    p.add_argument(
        "--quick", action="store_true",
        help="headline rows only (skip non-Ctrl variants, batch sweep, serving)",
    )
    args = p.parse_args(argv)

    dev = jax.devices()[0].device_kind
    rows = []

    dt, mp = bench_ctrl("2x", 256, 1)
    rows.append(("2X Ctrl 1.8M, 256^2 b1", dt, mp))
    dt, mp = bench_ctrl("3x", 512, 4)
    rows.append(("3X Ctrl 3.5M, 512^2 b4", dt, mp))
    dt, mp = bench_ctrl("4x", 512, 8)
    rows.append(("4X Ctrl 14M, 512^2 b8 [headline]", dt, mp))
    if not args.quick:
        # Non-Ctrl (controllable=False) variants — the other half of the
        # published checkpoint table (BASELINE.md configs).
        dt, mp = bench_ctrl("2x", 256, 1, controllable=False)
        rows.append(("2X non-Ctrl 1.7M, 256^2 b1", dt, mp))
        dt, mp = bench_ctrl("3x", 512, 4, controllable=False)
        rows.append(("3X non-Ctrl 3.4M, 512^2 b4", dt, mp))
        dt, mp = bench_ctrl("4x", 512, 8, controllable=False)
        rows.append(("4X non-Ctrl 14M, 512^2 b8", dt, mp))
        # Batch sweep 1..8 on the headline config, through the production
        # batch dispatcher (BASELINE.json's comparison surface is batch
        # 1-8; naive per-batch graphs are pathological at b2-b7 — see
        # engine/batching.py).
        for b in (1, 2, 3, 4, 5, 6, 7):
            dt, mp = bench_ctrl("4x", 512, b, dispatch=True)
            rows.append((f"4X Ctrl 14M, 512^2 b{b} [dispatched]", dt, mp))
    dt, mp, dmin, dmax = bench_control_sweep()
    rows.append(("2X Ctrl control sweep (8 settings)", dt, mp))
    dt, mp = bench_unet(256, 1)
    rows.append(("2X UNet 56M (0.3.0 default), 256^2 b1", dt, mp))
    if not args.skip_4k:
        dt, mp = bench_tiled_4k_compute()
        rows.append(("4X Ctrl tiled 4K->16K stream [compute-only]", dt, mp))
        dt, mp = bench_tiled_4k()
        rows.append(("4X Ctrl tiled 4K->16K stream", dt, mp))
    if not args.quick:
        dt, mp = bench_serving_compute()
        rows.append(("4X Ctrl serving: 8 conc ~1MP [compute-only]", dt, mp))
        dt, mp = bench_serving()
        rows.append(("4X Ctrl serving: 8 concurrent ~1MP reqs, uint8", dt, mp))

    print(f"\nDevice: {dev}")
    print(f"{'scenario':<42} {'ms/call':>10} {'input MP/s':>12}")
    for name, dt, mp in rows:
        print(f"{name:<42} {dt * 1e3:>10.2f} {mp / dt:>12.2f}")
        print(
            json.dumps(
                {"metric": name, "value": round(mp / dt, 3), "unit": "MP/s",
                 "ms_per_call": round(dt * 1e3, 2), "device": dev}
            )
        )
    print(f"control sweep output delta range: [{dmin:.4f}, {dmax:.4f}]")


if __name__ == "__main__":
    main()
