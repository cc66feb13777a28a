"""Training-throughput benchmark: step/s, input MP/s, estimated MFU, and
host data-loader throughput vs device demand.

Closes the half of the perf story the inference suite (tools/bench_suite.py)
doesn't cover.  Comparison surface is the reference's hot loop
(pretrain.py:238-267: forward + VGG losses + backward + clip/step with
accumulation); scenarios use the reference training defaults
(BASELINE.md: batch 32 x accum 4, bf16):

  1. 0.3.0 U-Net default config (56M) -- 2X, 256^2 targets (128^2 LR in).
  2. Ctrl 4X preset (14M, the headline inference model) -- 256^2 targets
     (64^2 LR in), trained via the --arch ctrl path.

Timing uses chained dispatch + a one-scalar readback (bench.py rationale:
block_until_ready is unreliable through the tunneled backend).  MFU for the
U-Net is estimated from XLA's own cost model
(``compiled.cost_analysis()['flops']``) against the chip's bf16 peak; for
the Ctrl family the cost model is USELESS — it counts a ``lax.scan`` body
ONCE, not trip-count times, under-reporting the 40-layer 4X body ~30x (this
is what produced the bogus "15.9% MFU" number in round 2) — so Ctrl flops
are computed analytically from the conv shapes (``ctrl_fwd_flops``).

The loader benchmark decodes real PNGs (synthesized once into a temp dir)
through the full degradation chain -- blur, noise, resize, real JPEG
encode/decode -- and reports host images/s so loader-vs-device balance is
measurable (reference worker-process analog: pretrain.py:164-172).
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak of one TPU v5e (v5 lite) chip.
V5E_BF16_PEAK_FLOPS = 197e12


def _device_peak_flops() -> float:
    d = jax.devices()[0]
    if "v5 lite" in d.device_kind.lower() or "v5e" in d.device_kind.lower():
        return V5E_BF16_PEAK_FLOPS
    return V5E_BF16_PEAK_FLOPS  # best-effort default; printed with the kind


def _synth_batch(rng, batch, target, ratio):
    lr = target // ratio
    return {
        "x": jnp.asarray(rng.uniform(0, 1, (batch, lr, lr, 3)), jnp.float32),
        "y": jnp.asarray(rng.uniform(0, 1, (batch, target, target, 3)), jnp.float32),
        "y_deg": jnp.asarray(rng.uniform(0, 1, (batch, 3)), jnp.float32),
    }


def _time_steps(step, state, batch, iters):
    """Average seconds/step: chain ``iters`` dispatches, close the pipeline
    with a one-scalar D2H readback of the last metrics.

    The frozen VGG weights must enter the jitted step as HOST-array closure
    constants (init_vgg19_features returns numpy): passing them as jit
    arguments measured 8x slower end-to-end (XLA cannot pre-layout/fold
    argument weights), and device-resident constants force a D2H read at
    trace time that the tunneled dev backend cannot service.
    """
    state, m = step(state, batch)  # compile + warm
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters, state


def bench_unet_train(batch=32, target=256, ratio=2, accum=4, iters=12):
    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import unet
    from ultrazoom_tpu.train import TrainState, make_optimizer, make_pretrain_step

    cfg = unet.MewZoomConfig(upscale_ratio=ratio)  # 0.3.0 defaults, 56M
    params = unet.init(jax.random.key(0), cfg)
    vgg = init_vgg19_features(seed=0)
    opt = make_optimizer(3e-4, 2.0, accumulation_steps=accum)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    step_fn = make_pretrain_step(
        cfg, opt, vgg, remat=True, compute_dtype=jnp.bfloat16
    )
    step = jax.jit(step_fn, donate_argnums=0)
    batch_d = _synth_batch(np.random.default_rng(0), batch, target, ratio)
    flops = _step_flops(step_fn, state, batch_d)
    dt, _ = _time_steps(step, state, batch_d, iters)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return dt, batch * target * target / 1e6, flops, n_params


def ctrl_fwd_flops(cfg, batch: int, lh: int, lw: int) -> float:
    """Analytic forward flops of the Ctrl model (scan body + stem + tail).
    XLA's cost model counts the scan body once instead of num_layers times,
    so it cannot be used for this family."""
    c, h = cfg.num_channels, cfg.num_channels * cfg.hidden_ratio
    f = cfg.num_layers * 2 * (2 * 9 * c * h * lh * lw * batch)  # body convs
    f += 2 * 3 * c * lh * lw * batch  # stem 1x1
    f += 2 * 9 * c * 3 * cfg.upscale_ratio**2 * lh * lw * batch  # tail
    return float(f)


def bench_ctrl_train(
    batch=32, target=256, ratio=4, accum=4, iters=12, remat="hidden",
    loss_combiner="balanced",
):
    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.train import (
        TrainState,
        make_ctrl_pretrain_step,
        make_optimizer,
    )

    cfg = ctrl.PRESETS[f"{ratio}x"]
    params = ctrl.init(jax.random.key(0), cfg)
    vgg = None if loss_combiner == "pixel" else init_vgg19_features(seed=0)
    opt = make_optimizer(3e-4, 2.0, accumulation_steps=accum)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    step_fn = make_ctrl_pretrain_step(
        cfg, opt, vgg, compute_dtype=jnp.bfloat16, remat=remat,
        loss_combiner=loss_combiner,
    )
    step = jax.jit(step_fn, donate_argnums=0)
    batch_d = _synth_batch(np.random.default_rng(0), batch, target, ratio)
    # fwd + bwd(2x) + full-remat recompute (selective "hidden" recomputes
    # only pointwise ops — no conv recompute, so multiplier 3).
    mult = 4.0 if remat is True else 3.0
    flops = ctrl_fwd_flops(cfg, batch, target // ratio, target // ratio) * mult
    dt, _ = _time_steps(step, state, batch_d, iters)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return dt, batch * target * target / 1e6, flops, n_params


def _step_flops(step_fn, state, batch) -> float | None:
    """XLA cost-model flops for one compiled step (None if unavailable)."""
    try:
        compiled = jax.jit(step_fn).lower(state, batch).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def bench_loader(
    n_images=64, image_size=512, target=256, ratio=4, batch=32, workers=8,
    epochs=2,
):
    """Host pipeline only: PNG decode -> crop/flip/jitter -> blur -> noise
    -> resize -> real JPEG roundtrip -> tensorize."""
    from PIL import Image

    from ultrazoom_tpu.data import (
        AugmentConfig,
        BatchLoader,
        DegradationConfig,
        ImageFolder,
    )

    with tempfile.TemporaryDirectory() as root:
        rng = np.random.default_rng(0)
        for i in range(n_images):
            # Textured images (not flat noise) for realistic PNG decode cost.
            base = rng.uniform(0, 1, (image_size // 8, image_size // 8, 3))
            img = np.kron(base, np.ones((8, 8, 1)))
            img += rng.uniform(-0.1, 0.1, img.shape)
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ).save(f"{root}/{i}.png")

        ds = ImageFolder(
            root, target, ratio, DegradationConfig(), AugmentConfig(target)
        )
        loader = BatchLoader(ds, batch, seed=0, num_workers=workers)
        for _ in loader:  # warm epoch (page cache, thread pool spin-up)
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(epochs):
            for b in loader:
                n += b["x"].shape[0]
        dt = time.perf_counter() - t0
    return n / dt, n * target * target / 1e6 / dt


def bench_cached_loader(
    n_images=32, image_size=512, target=256, ratio=2, batch=32, workers=8,
    epochs=4, variants=4,
):
    """Offline-cache loader throughput (uint8 memmaps, data/cached.py) —
    the fix for hosts where the live chain above cannot feed the chip."""
    import tempfile

    from PIL import Image

    from ultrazoom_tpu.data import (
        AugmentConfig,
        BatchLoader,
        CachedImageFolder,
        DegradationConfig,
        ImageFolder,
        build_sample_cache,
    )

    with tempfile.TemporaryDirectory() as root:
        rng = np.random.default_rng(0)
        for i in range(n_images):
            base = rng.uniform(0, 1, (image_size // 8, image_size // 8, 3))
            img = np.kron(base, np.ones((8, 8, 1)))
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ).save(f"{root}/{i}.png")
        live = ImageFolder(
            root, target, ratio, DegradationConfig(), AugmentConfig(target)
        )
        build_sample_cache(
            live, f"{root}/cache", num_variants=variants, num_workers=workers
        )
        ds = CachedImageFolder(f"{root}/cache")
        loader = BatchLoader(ds, batch, seed=0, num_workers=workers)
        for _ in loader:
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(epochs):
            for b in loader:
                n += b["x"].shape[0]
        dt = time.perf_counter() - t0
    return n / dt, n * target * target / 1e6 / dt


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--skip_loader", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args(argv)

    dev = jax.devices()[0].device_kind
    peak = _device_peak_flops()
    rows = []

    dt, mp, flops, n = bench_unet_train(iters=args.iters)
    rows.append(("pretrain 0.3.0 U-Net 2X 56M, 256^2 b32 accum4 bf16 remat", dt, mp, flops, n))
    dt, mp, flops, n = bench_ctrl_train(iters=args.iters)
    rows.append(("pretrain Ctrl 4X 14M, 256^2 b32 accum4 bf16 remat=hidden", dt, mp, flops, n))
    dt, mp, flops, n = bench_ctrl_train(iters=args.iters, loss_combiner="pixel")
    rows.append(("pretrain Ctrl 4X 14M pixel-only, 256^2 b32 accum4 bf16 remat=hidden", dt, mp, flops, n))

    print(f"\nDevice: {dev} (assumed bf16 peak {peak / 1e12:.0f} TFLOP/s)")
    print(f"{'scenario':<52} {'ms/step':>9} {'steps/s':>8} {'HR MP/s':>8} {'~MFU':>6}")
    for name, dt, mp, flops, n_params in rows:
        mfu = flops / dt / peak if flops else float("nan")
        print(
            f"{name:<52} {dt * 1e3:>9.1f} {1 / dt:>8.2f} {mp / dt:>8.2f} "
            f"{mfu * 100:>5.1f}%"
        )
        print(
            json.dumps(
                {
                    "metric": f"train {name}",
                    "value": round(mp / dt, 3),
                    "unit": "HR MP/s",
                    "ms_per_step": round(dt * 1e3, 1),
                    "steps_per_s": round(1 / dt, 3),
                    "est_mfu": round(mfu, 4) if flops else None,
                    "params": n_params,
                    "device": dev,
                }
            )
        )

    if not args.skip_loader:
        imgs_s, mp_s = bench_loader()
        print(
            f"loader (PNG 512^2 -> full degradation chain, 8 threads): "
            f"{imgs_s:.1f} images/s = {mp_s:.2f} HR MP/s"
        )
        print(
            json.dumps(
                {
                    "metric": "loader PNG512 degradation chain, 8 threads",
                    "value": round(mp_s, 3),
                    "unit": "HR MP/s",
                    "images_per_s": round(imgs_s, 2),
                }
            )
        )
        imgs_s, mp_s = bench_cached_loader()
        print(
            f"loader (offline uint8 sample cache, 8 threads): "
            f"{imgs_s:.1f} images/s = {mp_s:.2f} HR MP/s"
        )
        print(
            json.dumps(
                {
                    "metric": "loader offline uint8 sample cache, 8 threads",
                    "value": round(mp_s, 3),
                    "unit": "HR MP/s",
                    "images_per_s": round(imgs_s, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
