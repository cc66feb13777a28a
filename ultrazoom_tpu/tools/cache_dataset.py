"""Pre-degrade an image folder into an offline sample cache.

The blind-degradation chain (blur -> noise -> resize -> real JPEG,
reference data.py:137-148) runs on the host; on a host with few cores it
cannot keep a TPU fed live.  Every stage is uint8-exact, so this tool
materialises it once — bit-identical to the live pipeline — into memmaps
that ``CachedImageFolder`` serves at memory bandwidth.

Point ``--train_images_path`` / ``--test_images_path`` of
``train.pretrain`` (and ``train.finetune``) at the output directory; the
trainers auto-detect a cache by its ``cache_meta.json``.

Usage::

    python -m ultrazoom_tpu.tools.cache_dataset --images_path ./dataset/train \
        --out ./cache/train_2x --upscale_ratio 2 --num_variants 30
    python -m ultrazoom_tpu.tools.cache_dataset --images_path ./dataset/test \
        --out ./cache/test_2x --upscale_ratio 2 --eval
"""

from __future__ import annotations

import argparse

from ultrazoom_tpu.data import (
    AugmentConfig,
    DegradationConfig,
    ImageFolder,
    build_sample_cache,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--images_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_variants", type=int, default=1,
                   help="degraded variants per source image (= live epochs "
                   "of unique data)")
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
    p.add_argument("--eval", action="store_true",
                   help="evaluation cache: no jitter, no flips (matches the "
                   "trainers' test-set transform)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_dataset_processes", type=int, default=8)
    p.add_argument(
        "--max_images", type=int, default=None,
        help="cache only the first N source images (subset experiments)",
    )
    args = p.parse_args(argv)

    deg = DegradationConfig(
        args.min_gaussian_blur, args.max_gaussian_blur,
        args.min_gaussian_noise, args.max_gaussian_noise,
        args.min_compression, args.max_compression,
    )
    if args.eval:
        aug = AugmentConfig(args.target_resolution, 0, 0, 0, 0, horizontal_flip=False)
    else:
        aug = AugmentConfig(
            args.target_resolution, args.brightness_jitter, args.contrast_jitter,
            args.saturation_jitter, args.hue_jitter,
        )
    ds = ImageFolder(
        args.images_path, args.target_resolution, args.upscale_ratio, deg, aug
    )
    if args.max_images is not None:
        ds.paths = ds.paths[: args.max_images]
    meta = build_sample_cache(
        ds, args.out,
        num_variants=args.num_variants,
        seed=args.seed,
        num_workers=args.num_dataset_processes,
        progress=True,
    )
    print(
        f"Cached {meta['n_samples']} samples "
        f"({meta['n_images']} images x {meta['num_variants']} variants, "
        f"LR {meta['lr_shape'][0]}x{meta['lr_shape'][1]} -> "
        f"HR {meta['hr_shape'][0]}x{meta['hr_shape'][1]}) to {args.out}"
    )


if __name__ == "__main__":
    main()
