"""Stage-2 adversarial fine-tuning CLI.

Reference: fine-tune.py (flags at :41-78, loop at :240-330).  Loads a
stage-1 checkpoint, builds a Bouncer critic with spectral norm, and runs the
two-phase RaGAN step (see train/steps.py).  Convergence is monitored with
RelativisticF1 — fully optimized when the critic's F1 pegs near 0.5
(README.md:327).
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
from ultrazoom_tpu.metrics import RelativisticF1, psnr, ssim, vif
from ultrazoom_tpu.models import bouncer, unet
from ultrazoom_tpu.nn.transforms import (
    spectral_init_state,
    spectral_materialize,
)
from ultrazoom_tpu.parallel import shard_batch
from ultrazoom_tpu.parallel.mesh import make_mesh_for_batch
from ultrazoom_tpu.train.steps import (
    GanTrainState,
    TrainState,
    make_eval_step,
    make_finetune_step,
    make_optimizer,
)
from ultrazoom_tpu.utils import (
    AsyncCheckpointer,
    ScalarLogger,
    latest_meta,
    restore_state,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU stage-2 GAN fine-tuning")
    p.add_argument("--base_checkpoint_path", required=True)
    p.add_argument("--train_images_path", default="./dataset/train")
    p.add_argument("--test_images_path", default="./dataset/test")
    p.add_argument("--num_dataset_processes", type=int, default=8)
    p.add_argument("--target_resolution", type=int, default=512)
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
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_steps", type=int, default=16)
    p.add_argument("--upscaler_learning_rate", type=float, default=1e-4)
    p.add_argument("--upscaler_max_gradient_norm", type=float, default=1.0)
    p.add_argument("--critic_learning_rate", type=float, default=5e-4)
    p.add_argument("--critic_max_gradient_norm", type=float, default=5.0)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--critic_warmup_epochs", type=int, default=1)
    p.add_argument(
        "--critic_model_size", default="small", choices=("small", "medium", "large")
    )
    p.add_argument(
        "--feature_match_weight", type=float, default=1.0,
        help="post-normalisation weight on the critic stage2/stage3 "
        "feature-matching terms (1.0 = the reference's equal-weight recipe)",
    )
    p.add_argument(
        "--adversarial_weight", type=float, default=1.0,
        help="post-normalisation weight on the generator's adversarial BCE "
        "term (1.0 = the reference's equal-weight recipe)",
    )
    p.add_argument(
        "--pixel_weight", type=float, default=1.0,
        help="post-normalisation weight on the generator's pixel L2 anchor "
        "(1.0 = the reference's equal-weight recipe; >1 slows the stage's "
        "distortion-for-VIF trade, see the round-4 sweep)",
    )
    p.add_argument(
        "--best_psnr_floor", type=float, default=None,
        help="with --best_checkpoint_metric: only epochs whose eval PSNR is "
        ">= this floor are eligible for the _best snapshot — selects 'best "
        "perceptual metric subject to a distortion bar' (unconstrained "
        "best-VIF lands at an unshippable distortion point; see the "
        "round-4 sweep)",
    )
    p.add_argument("--activation_checkpointing", action="store_true")
    p.add_argument(
        "--remat_policy", default="auto", choices=("auto", "full", "hidden"),
        help="what --activation_checkpointing saves (see train.pretrain; "
        "'hidden' applies to the Ctrl generator scan body only)",
    )
    p.add_argument("--eval_interval", type=int, default=2)
    p.add_argument(
        "--best_checkpoint_metric", default="none",
        choices=("none", "psnr", "ssim", "vif"),
        help="additionally snapshot the state to <checkpoint_path>_best "
        "whenever this eval metric improves — GAN evals oscillate, so the "
        "final state is rarely the shippable one (the reference's "
        "fine-tune.py keeps only the latest checkpoint; see "
        "/root/reference/fine-tune.py:382-391)",
    )
    p.add_argument("--checkpoint_interval", type=int, default=2)
    p.add_argument("--checkpoint_path", default="./checkpoints/finetune")
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
    p.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans (fail fast on NaN; disables some fusion)",
    )
    p.add_argument(
        "--no_nan_guard", dest="nan_guard", action="store_false", default=True,
        help="disable the checkpoint-and-rewind NaN guard (see train.pretrain)",
    )
    p.add_argument("--max_nan_rewinds", type=int, default=3)
    p.add_argument(
        "--spike_threshold", type=float, default=1e6,
        help="also trip the guard on finite epoch-mean metrics above this "
        "magnitude (see train.pretrain); 0 disables",
    )
    p.add_argument(
        "--inject_nan_epoch", type=int, default=None,
        help="fault injection for guard testing: NaN-poison the generator "
        "params once at the start of this epoch",
    )
    p.add_argument(
        "--device_data_budget_gib", type=float, default=None,
        help="HBM budget for the device-resident sample cache (default: "
        "ULTRAZOOM_DEVICE_DATA_BUDGET_GIB env var, else 4.0); a cache over "
        "budget falls back to the host loader",
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

    watchdog = HangWatchdog(args.hang_timeout_s, label="finetune").start()
    seed = args.seed if args.seed is not None else random.randrange(2**31)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    base_meta = latest_meta(args.base_checkpoint_path)
    assert base_meta is not None, (
        f"No checkpoint at {args.base_checkpoint_path} (expected a directory "
        "written by the pretrain CLI)."
    )
    # Arch dispatch: fine-tune whatever family the base checkpoint is —
    # the 0.3.0 U-Net or the controllable 0.2.x architecture (the family
    # of every published HF checkpoint; the reference fine-tunes it with
    # the same two-phase recipe, fine-tune.py:240-330).
    is_ctrl = base_meta.get("architecture") == "mewzoom-ctrl"
    from ultrazoom_tpu.train.steps import (
        load_ctrl_pretrain_params,
        load_pretrain_params,
    )

    if is_ctrl:
        from ultrazoom_tpu.models import ctrl as _ctrl

        cfg = _ctrl.MewZoomCtrlConfig.from_dict(base_meta["upscaler_args"])
        u_params, _ = load_ctrl_pretrain_params(args.base_checkpoint_path, cfg)
    else:
        cfg = unet.MewZoomConfig.from_dict(base_meta["upscaler_args"])
        u_params, _ = load_pretrain_params(args.base_checkpoint_path, cfg)

    c_cfg = bouncer.PRESETS[args.critic_model_size]
    c_params = bouncer.init(jax.random.key(seed + 1), c_cfg)
    sn_state = spectral_init_state(
        c_params, jax.random.key(seed + 2), bouncer.spectral_norm_paths
    )

    u_opt = make_optimizer(
        args.upscaler_learning_rate, args.upscaler_max_gradient_norm,
        args.gradient_accumulation_steps,
    )
    c_opt = make_optimizer(
        args.critic_learning_rate, args.critic_max_gradient_norm,
        args.gradient_accumulation_steps,
    )
    state = GanTrainState(
        u_params, u_opt.init(u_params), c_params, c_opt.init(c_params),
        sn_state, jnp.zeros((), jnp.int32),
    )
    start_epoch = 1
    if not args.resume and args.auto_resume:
        args.resume = latest_meta(args.checkpoint_path) is not None
    if args.resume:
        state, meta = restore_state(args.checkpoint_path, state)
        start_epoch = meta["epoch"] + 1
        print(f"Resumed fine-tuning from epoch {meta['epoch']}.")
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

    compute_dtype = (
        jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    )
    remat: bool | str = False
    # Explicit (non-auto) --remat_policy implies activation checkpointing
    # (same rationale as train.pretrain).
    if args.activation_checkpointing or args.remat_policy != "auto":
        if is_ctrl and args.remat_policy in ("auto", "hidden"):
            remat = "hidden"
        else:
            remat = True
    if is_ctrl:
        from ultrazoom_tpu.train.steps import make_ctrl_finetune_step

        step_fn = make_ctrl_finetune_step(
            cfg, c_cfg, u_opt, c_opt,
            remat=remat, compute_dtype=compute_dtype,
            feature_match_weight=args.feature_match_weight,
            adversarial_weight=args.adversarial_weight,
            pixel_weight=args.pixel_weight,
        )
    else:
        step_fn = make_finetune_step(
            cfg, c_cfg, u_opt, c_opt,
            remat=remat, compute_dtype=compute_dtype,
            feature_match_weight=args.feature_match_weight,
            adversarial_weight=args.adversarial_weight,
            pixel_weight=args.pixel_weight,
        )
    mesh = make_mesh_for_batch(args.batch_size)
    if mesh is not None:
        from ultrazoom_tpu.parallel.mesh import batch_sharded, replicated

        step = jax.jit(
            step_fn,
            static_argnums=2,
            in_shardings=(replicated(mesh), batch_sharded(mesh)),
            out_shardings=(replicated(mesh), replicated(mesh)),
        )
        put = partial(shard_batch, mesh)
    else:
        step = jax.jit(step_fn, static_argnums=2)
        put = lambda b: jax.tree.map(jnp.asarray, b)

    deg = DegradationConfig(
        args.min_gaussian_blur, args.max_gaussian_blur,
        args.min_gaussian_noise, args.max_gaussian_noise,
        args.min_compression, args.max_compression,
    )
    aug = AugmentConfig(
        args.target_resolution, args.brightness_jitter, args.contrast_jitter,
        args.saturation_jitter, args.hue_jitter,
    )
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
            train_ds.meta, args.target_resolution, cfg.upscale_ratio, deg, aug
        )
        print(f"Using sample cache for training data: {args.train_images_path}")
    else:
        train_ds = ImageFolder(
            args.train_images_path, args.target_resolution, cfg.upscale_ratio,
            deg, aug,
        )
    if is_sample_cache(args.test_images_path):
        test_ds = CachedImageFolder(args.test_images_path)
        assert_cache_matches(
            test_ds.meta, args.target_resolution, cfg.upscale_ratio, deg
        )
    else:
        test_ds = ImageFolder(
            args.test_images_path, args.target_resolution, cfg.upscale_ratio, deg,
            AugmentConfig(args.target_resolution, 0, 0, 0, 0, horizontal_flip=False),
        )
    train_loader = BatchLoader(
        train_ds, args.batch_size, seed=seed, num_workers=args.num_dataset_processes
    )
    test_loader = BatchLoader(
        test_ds, max(1, min(args.batch_size, len(test_ds))), seed=seed,
        shuffle=False, num_workers=args.num_dataset_processes,
    )

    # Device-resident fast path (see pretrain.py / train/device_data.py).
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
            step_fn, num_extra_static=1, mesh=mesh, mode=data_mode,
            n_samples=len(train_ds),
        )

    if is_ctrl:
        from ultrazoom_tpu.train.steps import make_ctrl_eval_step

        eval_fn = jax.jit(make_ctrl_eval_step(cfg, compute_dtype=compute_dtype))
    else:
        eval_fn = jax.jit(make_eval_step(cfg, compute_dtype=compute_dtype))
    def _critic_logit(cp, sn, x):
        mat, _ = spectral_materialize(cp, sn, update=False)
        return bouncer.apply(mat, x, compute_dtype=compute_dtype)[-1]

    critic_fn = jax.jit(_critic_logit)
    logger = ScalarLogger(args.run_dir_path)
    f1 = RelativisticF1()
    checkpointer = AsyncCheckpointer()

    # NaN checkpoint-and-rewind guard (train/guard.py); epoch-0 checkpoint
    # guarantees a rewind target.
    from ultrazoom_tpu.train.guard import NanRewindGuard, poison_params

    base_meta = {
        "upscaler_args": cfg.to_dict(),
        "critic_args": c_cfg.to_dict(),
        "architecture": "mewzoom-ctrl" if is_ctrl else "mewzoom-unet",
        "seed": seed,
    }
    guard = None
    if args.nan_guard:
        guard = NanRewindGuard(args.checkpoint_path, args.max_nan_rewinds)
        if latest_meta(args.checkpoint_path) is None:
            checkpointer.save(args.checkpoint_path, state, {"epoch": 0, **base_meta})
    injected = False

    best_metric = args.best_checkpoint_metric
    best_path = args.checkpoint_path.rstrip("/") + "_best"
    best_value = -float("inf")
    if best_metric != "none":
        prior_best = latest_meta(best_path)
        if prior_best is not None:  # --auto_resume: keep the old bar
            best_value = float(prior_best.get("best_value", -float("inf")))

    epoch = start_epoch
    while epoch <= args.num_epochs:
        watchdog.beat()
        warmup = epoch <= args.critic_warmup_epochs
        if args.inject_nan_epoch == epoch and not injected:
            state = poison_params(state)
            injected = True
            print(f"[fault-injection] generator params NaN-poisoned at epoch {epoch}")
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
                state, metrics = gather_step(state, device_data, idx, warmup)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + v
                n += 1
        else:
            for batch in train_loader:
                # Positional: pjit with in_shardings rejects kwargs.
                state, metrics = step(state, put(batch), warmup)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + v
                n += 1
        means = {k: float(v) / n for k, v in sums.items()}
        watchdog.beat()  # epoch's device work synced (the float() readbacks)

        if guard is not None and guard.tripped(means, args.spike_threshold):
            state, epoch = guard.handle_trip(
                checkpointer, state, epoch, means,
                replay_step=(
                    # warmup must match what each replayed epoch used.
                    (lambda s, idx, e: gather_step(
                        s, device_data, idx, e <= args.critic_warmup_epochs,
                    ))
                    if device_data is not None else None
                ),
                index_batches_for_epoch=lambda e: epoch_batch_indices(
                    len(train_ds), args.batch_size, data_seed, e - 1,
                    n_shards=n_shards,
                ),
                loss_key="critic_bce",
                spike_threshold=args.spike_threshold,
            )
            continue

        for k, v in means.items():
            logger.add_scalar(f"finetune/{k}", v, epoch)
        print(
            f"Epoch {epoch}{' (warmup)' if warmup else ''}: "
            + ", ".join(f"{k}: {v:.5g}" for k, v in sorted(means.items()))
        )

        if epoch % args.eval_interval == 0:
            f1.reset()
            ps_s = ss_s = vf_s = 0.0
            m = 0
            for batch in test_loader:
                # Cached batches arrive uint8; normalise on device.
                from ultrazoom_tpu.train.steps import as_float01

                x = as_float01(jnp.asarray(batch["x"]))
                y = as_float01(jnp.asarray(batch["y"]))
                if is_ctrl:
                    sr = eval_fn(state.u_params, x, jnp.asarray(batch["y_deg"]))
                else:
                    sr, _ = eval_fn(state.u_params, x)
                pred_fake = np.asarray(critic_fn(state.c_params, state.sn_state, sr))
                pred_real = np.asarray(critic_fn(state.c_params, state.sn_state, y))
                f1.update(
                    pred_real, pred_fake,
                    np.ones_like(pred_real), np.zeros_like(pred_fake),
                )
                ps_s += float(psnr(sr, y))
                ss_s += float(ssim(sr, y))
                vf_s += float(vif(sr, y))
                m += 1
            if m:
                score, precision, recall = f1.compute()
                logger.add_scalar("eval/psnr", ps_s / m, epoch)
                logger.add_scalar("eval/ssim", ss_s / m, epoch)
                logger.add_scalar("eval/vif", vf_s / m, epoch)
                logger.add_scalar("eval/critic_f1", score, epoch)
                print(
                    f"Eval {epoch}: PSNR {ps_s / m:.3f}, SSIM {ss_s / m:.4f}, "
                    f"VIF {vf_s / m:.4f}, critic F1 {score:.3f} "
                    f"(P {precision:.3f} / R {recall:.3f})"
                )
                if best_metric != "none":
                    value = {
                        "psnr": ps_s / m, "ssim": ss_s / m, "vif": vf_s / m,
                    }[best_metric]
                    eligible = (
                        args.best_psnr_floor is None
                        or ps_s / m >= args.best_psnr_floor
                    )
                    if eligible and value > best_value:
                        best_value = value
                        checkpointer.save(
                            best_path, state,
                            {
                                "epoch": epoch, **base_meta,
                                "best_metric": best_metric,
                                "best_value": best_value,
                            },
                        )
                        print(
                            f"Best-{best_metric} checkpoint updated at epoch "
                            f"{epoch} ({best_value:.4f})."
                        )

        if epoch % args.checkpoint_interval == 0:
            checkpointer.save(args.checkpoint_path, state, {"epoch": epoch, **base_meta})
            print(f"Checkpoint save started at epoch {epoch} (async).")
            watchdog.beat()  # save()'s D2H pull completed
        epoch += 1

    watchdog.close()
    checkpointer.wait()
    logger.close()


if __name__ == "__main__":
    main()
