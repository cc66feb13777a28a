"""Stage-1 pretraining CLI.

Flag names match the reference (``pretrain.py:39-84`` / README.md:284-323)
for muscle-memory compatibility; the loop itself is TPU-native: one jitted
step (forward + losses + grads + clip + AdamW + accumulation), scalars
accumulated on device and pulled once per epoch, batch data-parallel over a
device mesh when more than one chip is visible.

Usage::

    python -m ultrazoom_tpu.train.pretrain --train_images_path ./dataset/train \
        --test_images_path ./dataset/test --upscale_ratio 2
"""

from __future__ import annotations

import argparse
import random
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.data import (
    AugmentConfig,
    BatchLoader,
    DegradationConfig,
    ImageFolder,
)
from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.metrics import psnr, ssim, vif
from ultrazoom_tpu.models import unet
from ultrazoom_tpu.ops import upsample2d
from ultrazoom_tpu.parallel import jit_data_parallel, shard_batch
from ultrazoom_tpu.parallel.mesh import make_mesh_for_batch
from ultrazoom_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_pretrain_step,
)
from ultrazoom_tpu.utils import AsyncCheckpointer, ScalarLogger, restore_state


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU stage-1 pretraining")
    p.add_argument("--train_images_path", default="./dataset/train")
    p.add_argument("--test_images_path", default="./dataset/test")
    p.add_argument("--num_dataset_processes", type=int, default=8)
    p.add_argument("--target_resolution", type=int, default=256)
    p.add_argument("--upscale_ratio", type=int, default=2, choices=(2, 3, 4, 8))
    p.add_argument("--min_gaussian_blur", type=float, default=0.0)
    p.add_argument("--max_gaussian_blur", type=float, default=1.0)
    p.add_argument("--min_gaussian_noise", type=float, default=0.0)
    p.add_argument("--max_gaussian_noise", type=float, default=0.1)
    p.add_argument("--min_compression", type=float, default=0.0)
    p.add_argument("--max_compression", type=float, default=0.8)
    p.add_argument("--brightness_jitter", type=float, default=0.1)
    p.add_argument("--contrast_jitter", type=float, default=0.1)
    p.add_argument("--saturation_jitter", type=float, default=0.1)
    p.add_argument("--hue_jitter", type=float, default=0.1)
    p.add_argument(
        "--arch", default="unet", choices=("unet", "ctrl"),
        help="unet = 0.3.0 flagship; ctrl = controllable 0.1.x/0.2.x "
        "architecture (the published-checkpoint family)",
    )
    # 0.2.x-era flags (reference README.md:254-257), used with --arch ctrl.
    p.add_argument("--num_channels", type=int, default=48)
    p.add_argument("--num_encoder_layers", type=int, default=20)
    p.add_argument("--controllable", action="store_true", default=True)
    p.add_argument("--no_controllable", dest="controllable", action="store_false")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--upscaler_learning_rate", type=float, default=3e-4)
    p.add_argument("--adaptive_loss_learning_rate", type=float, default=1e-3)
    p.add_argument(
        "--adaptive_sigma_floor", type=float, default=-1.25,
        help="clamp the adaptive combiner's log-sigmas from below inside "
        "the loss (stability guard against Kendall-weight runaway, "
        "isolated by deterministic replay — see losses/adversarial.py); "
        "pass a very negative value for the reference's unclamped "
        "behaviour",
    )
    p.add_argument(
        "--balanced_floor", type=float, default=1e-4,
        help="clamp each balanced-combiner divisor stop_grad(l_i) from "
        "below: the stock sum(l_i/sg(l_i)) scales task i's gradient by an "
        "UNBOUNDED 1/l_i as a task fits well.  Defence-in-depth against "
        "the loss-weight-runaway family (the adaptive analog was real); "
        "forensically ruled OUT as the cause of the 56M epoch-4 spike "
        "(see losses/adversarial.py and tools/forensic_balanced.py); "
        "pass 0 for the reference's exact behaviour",
    )
    p.add_argument(
        "--loss_combiner", default="balanced",
        choices=("balanced", "adaptive", "pixel", "pixel_ssim"),
        help="balanced/adaptive follow the reference's multitask recipes; "
        "pixel drops the VGG terms (the distortion-oriented recipe when "
        "pretrained VGG19 weights are unavailable); pixel_ssim adds a "
        "differentiable (1 - SSIM) term to target structural fidelity",
    )
    p.add_argument(
        "--init_params_from", default=None,
        help="initialise model params from this checkpoint directory "
        "(same architecture) instead of random init — e.g. polish a "
        "perceptually-pretrained model with --loss_combiner pixel",
    )
    p.add_argument("--max_gradient_norm", type=float, default=2.0)
    p.add_argument(
        "--lr_schedule", default="constant", choices=("constant", "cosine"),
        help="upscaler lr schedule: 'constant' matches the reference; "
        "'cosine' decays to 10%% of the peak over num_epochs — the "
        "edge-of-stability mitigation for late-training divergence at "
        "constant lr (ARCHITECTURE.md, adaptive-recipe forensics)",
    )
    p.add_argument(
        "--cosine_epochs", type=int, default=None,
        help="anneal horizon for --lr_schedule cosine (default: num_epochs). "
        "Decoupling it from num_epochs lets the anneal COMPLETE before an "
        "early stop can fire — the round-3 3X retrain showed that a plateau "
        "seen at mid-schedule lr is not the optimum the schedule reaches "
        "(ARCHITECTURE.md: early stopping truncates the anneal); the lr "
        "holds at the 10%% floor after the horizon",
    )
    p.add_argument("--num_primary_channels", type=int, default=48)
    p.add_argument("--num_primary_layers", type=int, default=4)
    p.add_argument("--num_secondary_channels", type=int, default=96)
    p.add_argument("--num_secondary_layers", type=int, default=4)
    p.add_argument("--num_tertiary_channels", type=int, default=192)
    p.add_argument("--num_tertiary_layers", type=int, default=4)
    p.add_argument("--num_quaternary_channels", type=int, default=384)
    p.add_argument("--num_quaternary_layers", type=int, default=8)
    p.add_argument("--hidden_ratio", type=int, default=2, choices=(1, 2, 4))
    p.add_argument("--activation_checkpointing", action="store_true")
    p.add_argument(
        "--remat_policy", default="auto", choices=("auto", "full", "hidden"),
        help="what --activation_checkpointing saves: 'full' = per-layer "
        "checkpointing (carries only); 'hidden' = selective (Ctrl arch "
        "only: save the wide conv1 outputs, recompute pointwise ops — "
        "measured 11%% faster than full at the 4X preset and never "
        "recomputes a conv); 'auto' = hidden for ctrl, full for unet",
    )
    p.add_argument("--eval_interval", type=int, default=2)
    p.add_argument("--checkpoint_interval", type=int, default=2)
    p.add_argument("--checkpoint_path", default="./checkpoints/pretrain")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--auto_resume", action="store_true",
        help="resume from checkpoint_path iff a complete checkpoint exists "
        "there (fresh start otherwise) — lets a supervisor blindly retry "
        "a failed/hung stage without losing finished epochs",
    )
    p.add_argument(
        "--hang_timeout_s", type=float, default=1800.0,
        help="exit(43) if no epoch completes for this many seconds — "
        "converts a wedged device RPC (tunnel backends can silently drop "
        "an in-flight call) into a retriable failure; <=0 disables",
    )
    p.add_argument("--run_dir_path", default="./runs")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--compute_dtype", default="bfloat16", choices=("bfloat16", "float32")
    )
    p.add_argument("--vgg_weights_path", default=None)
    p.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans (fail fast on NaN; disables some fusion)",
    )
    p.add_argument(
        "--no_nan_guard", dest="nan_guard", action="store_false", default=True,
        help="disable the checkpoint-and-rewind NaN guard (train/guard.py): "
        "by default a non-finite epoch triggers a deterministic replay "
        "diagnosis (device-resident data) and a rewind to the last "
        "checkpoint with a perturbed data order",
    )
    p.add_argument("--max_nan_rewinds", type=int, default=3)
    p.add_argument(
        "--spike_threshold", type=float, default=1e6,
        help="also trip the guard when any finite epoch-mean metric exceeds "
        "this magnitude (the round-3 instability manifested as a FINITE "
        "grad_norm ~6e14 epoch that only gradient clipping contained); "
        "0 disables the spike clause",
    )
    p.add_argument(
        "--inject_nan_epoch", type=int, default=None,
        help="fault injection for guard testing: NaN-poison the params once "
        "at the start of this epoch",
    )
    p.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler trace of epoch 1 into this directory",
    )
    p.add_argument(
        "--device_data_budget_gib", type=float, default=None,
        help="HBM budget for the device-resident sample cache (default: "
        "ULTRAZOOM_DEVICE_DATA_BUDGET_GIB env var, else 4.0); a cache over "
        "budget falls back to the host loader",
    )
    p.add_argument(
        "--early_stop_patience", type=int, default=None,
        help="stop when eval PSNR has not improved by --early_stop_min_delta "
        "for this many consecutive evals (the reference trains a fixed epoch "
        "count, /root/reference/pretrain.py:233; large-corpus runs plateau "
        "well before it)",
    )
    p.add_argument(
        "--early_stop_min_delta", type=float, default=0.01,
        help="dB of eval-PSNR improvement that resets the patience counter",
    )
    p.add_argument(
        "--max_train_samples", type=int, default=None,
        help="train on only the first N samples of a sample cache; caches "
        "are variant-major, so any N >= the cache's image count keeps "
        "every source image (a smaller N warns). Use to fit the "
        "device-data HBM budget alongside a large model",
    )
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    # Started before setup, not just the epoch loop: cache upload and the
    # first remote compile are exactly where a tunnel RPC wedge strands a
    # process with no recourse (observed live).
    from ultrazoom_tpu.train.watchdog import HangWatchdog

    watchdog = HangWatchdog(args.hang_timeout_s, label="pretrain").start()
    seed = args.seed if args.seed is not None else random.randrange(2**31)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    is_ctrl = args.arch == "ctrl"
    if is_ctrl:
        from ultrazoom_tpu.models import ctrl as _ctrl

        assert args.upscale_ratio in (2, 3, 4), (
            "the Ctrl architecture supports x2/x3/x4"
        )
        cfg = _ctrl.MewZoomCtrlConfig(
            upscale_ratio=args.upscale_ratio,
            num_channels=args.num_channels,
            num_layers=args.num_encoder_layers,
            hidden_ratio=min(args.hidden_ratio, 4),
            controllable=args.controllable,
        )
    else:
        assert args.upscale_ratio in (2, 4, 8), (
            "the 0.3.0 U-Net supports x2/x4/x8 (use --arch ctrl for x3)"
        )
        cfg = unet.MewZoomConfig(
            upscale_ratio=args.upscale_ratio,
            primary_channels=args.num_primary_channels,
            primary_layers=args.num_primary_layers,
            secondary_channels=args.num_secondary_channels,
            secondary_layers=args.num_secondary_layers,
            tertiary_channels=args.num_tertiary_channels,
            tertiary_layers=args.num_tertiary_layers,
            quaternary_channels=args.num_quaternary_channels,
            quaternary_layers=args.num_quaternary_layers,
            hidden_ratio=args.hidden_ratio,
        )
    deg = DegradationConfig(
        args.min_gaussian_blur, args.max_gaussian_blur,
        args.min_gaussian_noise, args.max_gaussian_noise,
        args.min_compression, args.max_compression,
    )
    aug = AugmentConfig(
        args.target_resolution, args.brightness_jitter, args.contrast_jitter,
        args.saturation_jitter, args.hue_jitter,
    )

    # A path produced by tools/cache_dataset.py (pre-degraded memmaps,
    # bit-identical to the live pipeline) is auto-detected and served at
    # memory bandwidth — the fix for loader-bound hosts.
    from ultrazoom_tpu.data import (
        CachedImageFolder,
        assert_cache_matches,
        is_sample_cache,
    )

    if is_sample_cache(args.train_images_path):
        train_ds = CachedImageFolder(
            args.train_images_path, max_samples=args.max_train_samples
        )
        assert_cache_matches(
            train_ds.meta, args.target_resolution, args.upscale_ratio, deg, aug
        )
        print(f"Using sample cache for training data: {args.train_images_path}")
    else:
        train_ds = ImageFolder(
            args.train_images_path, args.target_resolution, args.upscale_ratio,
            deg, aug,
        )
    if is_sample_cache(args.test_images_path):
        test_ds = CachedImageFolder(args.test_images_path)
        assert_cache_matches(
            test_ds.meta, args.target_resolution, args.upscale_ratio, deg
        )
    else:
        test_ds = ImageFolder(
            args.test_images_path, args.target_resolution, args.upscale_ratio, deg,
            AugmentConfig(args.target_resolution, 0, 0, 0, 0, horizontal_flip=False),
        )
    train_loader = BatchLoader(
        train_ds, args.batch_size, seed=seed, num_workers=args.num_dataset_processes
    )
    test_loader = BatchLoader(
        test_ds, max(1, min(args.batch_size, len(test_ds))), seed=seed,
        shuffle=False, num_workers=args.num_dataset_processes,
    )

    compute_dtype = (
        jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    )
    if is_ctrl:
        from ultrazoom_tpu.models import ctrl as _ctrl

        params = _ctrl.init(jax.random.key(seed), cfg)
    else:
        params = unet.init(jax.random.key(seed), cfg)
    if args.init_params_from:
        from ultrazoom_tpu.train.steps import (
            load_ctrl_pretrain_params,
            load_pretrain_params,
        )

        loader = load_ctrl_pretrain_params if is_ctrl else load_pretrain_params
        params, src_meta = loader(args.init_params_from, cfg)
        print(
            f"Initialised params from {args.init_params_from} "
            f"(epoch {src_meta.get('epoch', '?')})."
        )
    vgg = (
        None
        if args.loss_combiner in ("pixel", "pixel_ssim")
        else init_vgg19_features(args.vgg_weights_path, seed=0)
    )
    lr = args.upscaler_learning_rate
    if args.lr_schedule == "cosine":
        # Edge-of-stability mitigation (forensic_adaptive_late.py): late in
        # training the loss landscape sharpens until constant-lr AdamW steps
        # cross an amplification cliff (epoch-57 replay diverges at 3e-4,
        # is perfectly stable at 1e-4 on the identical state + data); a
        # cosine decay to 10% of the peak walks the lr down ahead of the
        # sharpening.  Schedules count inner-optimizer updates: one per
        # accumulation window.
        import optax

        updates_per_epoch = max(
            1,
            len(train_ds)
            // args.batch_size
            // args.gradient_accumulation_steps,
        )
        cosine_epochs = args.cosine_epochs or args.num_epochs
        lr = optax.cosine_decay_schedule(
            init_value=args.upscaler_learning_rate,
            decay_steps=cosine_epochs * updates_per_epoch,
            alpha=0.1,
        )
    if args.loss_combiner == "adaptive":
        from ultrazoom_tpu.train.steps import (
            make_adaptive_optimizer,
            wrap_params_with_loss_combiner,
        )

        params = wrap_params_with_loss_combiner(params, 3 if is_ctrl else 4)
        optimizer = make_adaptive_optimizer(
            lr,
            args.max_gradient_norm,
            args.gradient_accumulation_steps,
            args.adaptive_loss_learning_rate,
        )
    else:
        optimizer = make_optimizer(
            lr,
            args.max_gradient_norm,
            args.gradient_accumulation_steps,
        )
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    start_epoch = 1
    if not args.resume and args.auto_resume:
        from ultrazoom_tpu.utils import latest_meta

        args.resume = latest_meta(args.checkpoint_path) is not None
    if args.resume:
        state, meta = restore_state(args.checkpoint_path, state)
        start_epoch = meta["epoch"] + 1
        print(f"Resumed from epoch {meta['epoch']}.")
        if start_epoch > args.num_epochs:
            # Fast path for supervisor retries of an already-finished run:
            # skip dataset setup and the one-time device cache upload (the
            # upload can outlast --hang_timeout_s and get the no-op run
            # killed by its own watchdog).
            print(
                f"Training already complete (epoch {meta['epoch']} >= "
                f"num_epochs {args.num_epochs}); nothing to do."
            )
            return

    remat: bool | str = False
    # An explicit (non-auto) --remat_policy implies activation checkpointing:
    # a policy choice with checkpointing silently off is never what the user
    # meant, and costs a full compile to discover.
    if args.activation_checkpointing or args.remat_policy != "auto":
        if is_ctrl and args.remat_policy in ("auto", "hidden"):
            remat = "hidden"
        else:
            remat = True
    if is_ctrl:
        from ultrazoom_tpu.train.steps import make_ctrl_pretrain_step

        step_fn = make_ctrl_pretrain_step(
            cfg, optimizer, vgg,
            compute_dtype=compute_dtype,
            loss_combiner=args.loss_combiner,
            remat=remat,
            adaptive_sigma_floor=args.adaptive_sigma_floor,
            balanced_floor=args.balanced_floor or None,
        )
    else:
        step_fn = make_pretrain_step(
            cfg, optimizer, vgg,
            remat=remat,
            compute_dtype=compute_dtype,
            loss_combiner=args.loss_combiner,
            adaptive_sigma_floor=args.adaptive_sigma_floor,
            balanced_floor=args.balanced_floor or None,
        )
    mesh = make_mesh_for_batch(args.batch_size)
    if mesh is not None:
        step = jit_data_parallel(step_fn, mesh, donate_state=False)
        put = partial(shard_batch, mesh)
    else:
        step = jax.jit(step_fn, donate_argnums=0)
        put = lambda b: jax.tree.map(jnp.asarray, b)

    # Device-resident fast path: a cached dataset small enough for HBM is
    # uploaded once and batches are gathered on device — zero per-step H2D.
    from ultrazoom_tpu.train.device_data import (
        cache_nbytes,
        epoch_batch_indices,
        make_gather_step,
        plan_device_data,
        upload_cache,
    )

    device_data = None
    data_mode = (
        plan_device_data(
            train_ds, mesh, args.batch_size,
            budget=None if args.device_data_budget_gib is None
            else int(args.device_data_budget_gib * (1 << 30)),
        )
        if isinstance(train_ds, CachedImageFolder)
        else None
    )
    n_shards = mesh.size if (mesh is not None and data_mode == "sharded") else 1
    if data_mode is not None:
        print(
            f"Uploading {cache_nbytes(train_ds) / 2**30:.2f} GiB sample cache "
            f"to device ({data_mode}, one-time)..."
        )
        device_data = upload_cache(train_ds, mesh, data_mode)
        gather_step = make_gather_step(
            step_fn, mesh=mesh, mode=data_mode, n_samples=len(train_ds)
        )

    if is_ctrl:
        from ultrazoom_tpu.train.steps import make_ctrl_eval_step

        eval_fn = jax.jit(make_ctrl_eval_step(cfg, compute_dtype=compute_dtype))
    else:
        eval_fn = jax.jit(make_eval_step(cfg, compute_dtype=compute_dtype))
    logger = ScalarLogger(args.run_dir_path)
    checkpointer = AsyncCheckpointer()
    print(
        f"Model: {sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params)):,} "
        f"params | devices: {len(jax.devices())} | seed: {seed}"
    )

    # NaN checkpoint-and-rewind guard (train/guard.py).  An initial epoch-0
    # checkpoint guarantees there is always a rewind target.
    from ultrazoom_tpu.train.guard import NanRewindGuard, poison_params

    base_meta = {
        "upscaler_args": cfg.to_dict(),
        "architecture": "mewzoom-ctrl" if is_ctrl else "mewzoom-unet",
        "seed": seed,
        "loss_combiner": args.loss_combiner,
    }
    guard = None
    if args.nan_guard:
        guard = NanRewindGuard(args.checkpoint_path, args.max_nan_rewinds)
        from ultrazoom_tpu.utils import latest_meta as _latest_meta

        if _latest_meta(args.checkpoint_path) is None:
            checkpointer.save(args.checkpoint_path, state, {"epoch": 0, **base_meta})
    injected = False
    best_psnr = -float("inf")
    stale_evals = 0
    # Anneal-aware early stopping: a plateau observed while a cosine
    # schedule still sits at mid-anneal lr is not the optimum the schedule
    # reaches (the round-3 3X retrain early-stopped at ~0.7x peak lr and
    # lost to bicubic; re-annealed runs win — ARCHITECTURE.md).  Defer the
    # stop until the anneal is >=90% complete, so the detector only ever
    # judges near-floor-lr evals.
    early_stop_from = 1
    if args.lr_schedule == "cosine":
        import math

        early_stop_from = math.ceil(
            0.9 * (args.cosine_epochs or args.num_epochs)
        )

    epoch = start_epoch
    while epoch <= args.num_epochs:
        watchdog.beat()
        if args.inject_nan_epoch == epoch and not injected:
            state = poison_params(state)
            injected = True
            print(f"[fault-injection] params NaN-poisoned at epoch {epoch}")
        profiling = args.profile_dir is not None and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        # After a rewind the permutation seed is perturbed so the re-run
        # does not retrace the trajectory that just diverged.
        data_seed = seed + (guard.seed_offset() if guard else 0)
        sums: dict[str, jax.Array] = {}
        n = 0
        if device_data is not None:
            # epoch - 1: epoch_batch_indices is 0-based like BatchLoader's
            # internal counter, so both paths shuffle identically.
            for idx in epoch_batch_indices(
                len(train_ds), args.batch_size, data_seed, epoch - 1,
                n_shards=n_shards,
            ):
                state, metrics = gather_step(state, device_data, idx)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + v
                n += 1
        else:
            for batch in train_loader:
                state, metrics = step(state, put(batch))
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + v
                n += 1
        if profiling:
            jax.tree.map(lambda x: x.block_until_ready(), sums)
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {args.profile_dir}")
        means = {k: float(v) / n for k, v in sums.items()}
        watchdog.beat()  # epoch's device work synced (the float() readbacks)

        if guard is not None and guard.tripped(means, args.spike_threshold):
            # Deterministic replay from the last checkpoint (device-resident
            # data only): reproduced => real code bug (diagnosis pinpoints
            # step + batch); not reproduced => transient, substantiated.
            state, epoch = guard.handle_trip(
                checkpointer, state, epoch, means,
                replay_step=(
                    (lambda s, idx, e: gather_step(s, device_data, idx))
                    if device_data is not None else None
                ),
                index_batches_for_epoch=lambda e: epoch_batch_indices(
                    len(train_ds), args.batch_size, data_seed, e - 1,
                    n_shards=n_shards,
                ),
                loss_key="loss",
                spike_threshold=args.spike_threshold,
            )
            # The re-run needs room to climb back to its pre-trip quality
            # before the eval-plateau early stop may fire again.
            stale_evals = 0
            continue

        for k, v in means.items():
            logger.add_scalar(f"train/{k}", v, epoch)
        print(
            f"Epoch {epoch}: "
            + ", ".join(f"{k}: {v:.5g}" for k, v in sorted(means.items()))
        )

        if epoch % args.eval_interval == 0:
            ps_s = ss_s = vf_s = bps_s = 0.0
            m = 0
            model_params = (
                state.params["model"]
                if args.loss_combiner == "adaptive"
                else state.params
            )
            for batch in test_loader:
                if is_ctrl:
                    sr = eval_fn(
                        model_params,
                        jnp.asarray(batch["x"]),
                        jnp.asarray(batch["y_deg"]),
                    )
                else:
                    sr, _ = eval_fn(model_params, jnp.asarray(batch["x"]))
                # Cached batches arrive uint8; normalise on device.
                from ultrazoom_tpu.train.steps import as_float01

                y = as_float01(jnp.asarray(batch["y"]))
                bicubic = jnp.clip(
                    upsample2d(
                        as_float01(jnp.asarray(batch["x"])), cfg.upscale_ratio
                    ),
                    0, 1,
                )
                ps_s += float(psnr(sr, y))
                ss_s += float(ssim(sr, y))
                vf_s += float(vif(sr, y))
                bps_s += float(psnr(bicubic, y))
                m += 1
            if m:
                logger.add_scalar("eval/psnr", ps_s / m, epoch)
                logger.add_scalar("eval/ssim", ss_s / m, epoch)
                logger.add_scalar("eval/vif", vf_s / m, epoch)
                logger.add_scalar("eval/bicubic_psnr", bps_s / m, epoch)
                print(
                    f"Eval {epoch}: PSNR {ps_s / m:.3f} (bicubic {bps_s / m:.3f}), "
                    f"SSIM {ss_s / m:.4f}, VIF {vf_s / m:.4f}"
                )
                if ps_s / m > best_psnr + args.early_stop_min_delta:
                    best_psnr = ps_s / m
                    stale_evals = 0
                else:
                    stale_evals += 1

        if epoch % args.checkpoint_interval == 0:
            checkpointer.save(args.checkpoint_path, state, {"epoch": epoch, **base_meta})
            print(f"Checkpoint save started at epoch {epoch} (async).")
            watchdog.beat()  # save()'s D2H pull completed
        if (
            args.early_stop_patience is not None
            and stale_evals >= args.early_stop_patience
            and epoch < early_stop_from
        ):
            print(
                f"Early-stop deferred at epoch {epoch}: eval PSNR stale for "
                f"{stale_evals} evals but the cosine anneal is not done "
                f"(stopping allowed from epoch {early_stop_from})."
            )
        if (
            args.early_stop_patience is not None
            and stale_evals >= args.early_stop_patience
            and epoch >= early_stop_from
        ):
            print(
                f"Early stop at epoch {epoch}: eval PSNR stale for "
                f"{stale_evals} evals (best {best_psnr:.3f} dB)."
            )
            if epoch % args.checkpoint_interval != 0:
                checkpointer.save(
                    args.checkpoint_path, state, {"epoch": epoch, **base_meta}
                )
            break
        epoch += 1

    watchdog.close()
    checkpointer.wait()
    logger.close()


if __name__ == "__main__":
    main()
