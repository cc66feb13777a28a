"""Validation CLI: model vs plain-bicubic PSNR/SSIM/VIF on paired LR/HR
folders.

Reference: validate.py (0.2.x era; crashes in the snapshot — missing
``ultrazoom.control`` module).  This version works with both architectures:
HF-style directories (config.json + safetensors, either arch) and pretrain
checkpoint directories.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.data import ImagePairs
from ultrazoom_tpu.metrics import psnr, ssim, vif
from ultrazoom_tpu.models import ControlVector, MewZoomCtrl, from_pretrained
from ultrazoom_tpu.ops import upsample2d


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU validation")
    p.add_argument("--model_path", required=True, help="HF-style model dir")
    p.add_argument("--lr_images_path", required=True)
    p.add_argument("--hr_images_path", required=True)
    p.add_argument("--gaussian_blur", type=float, default=0.5)
    p.add_argument("--gaussian_noise", type=float, default=0.5)
    p.add_argument("--jpeg_compression", type=float, default=0.5)
    p.add_argument("--tile", type=int, default=None, help="overlap-tile size")
    p.add_argument(
        "--self_ensemble", action="store_true",
        help="x8 geometric TTA (engine/ensemble.py): average the 8 "
        "back-transformed dihedral views (~8x FLOPs, ~+0.1-0.2 dB)",
    )
    p.add_argument(
        "--compute_dtype", default="bfloat16", choices=("bfloat16", "float32")
    )
    return p


def _load_model(path):
    """HF-style dir OR a trainer checkpoint dir (meta.json present)."""
    import pathlib

    if (pathlib.Path(path) / "meta.json").exists():
        from ultrazoom_tpu.tools.export import load_model_from_train_checkpoint

        model, _ = load_model_from_train_checkpoint(path)
        return model
    return from_pretrained(path)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    model = _load_model(args.model_path)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    c = ControlVector(args.gaussian_blur, args.gaussian_noise, args.jpeg_compression)

    ds = ImagePairs(args.lr_images_path, args.hr_images_path)
    ratio = model.cfg.upscale_ratio

    sums = {"psnr": 0.0, "ssim": 0.0, "vif": 0.0,
            "bicubic_psnr": 0.0, "bicubic_ssim": 0.0, "bicubic_vif": 0.0}
    for i in range(len(ds)):
        pair = ds[i]
        x = pair["x"][None]
        y = jnp.asarray(pair["y"][None])
        kw = dict(compute_dtype=dtype, self_ensemble=args.self_ensemble)
        if args.tile:
            kw["tile"] = args.tile
        if isinstance(model, MewZoomCtrl):
            sr = model.upscale(x, c, **kw)
        else:
            sr = model.upscale(x, **kw)
        sr = jnp.asarray(np.asarray(sr, np.float32))
        bicubic = jnp.clip(upsample2d(jnp.asarray(x), ratio), 0, 1)
        # Guard against size drift between sr and ground truth.
        h = min(sr.shape[1], y.shape[1])
        w = min(sr.shape[2], y.shape[2])
        sr, yc, bc = sr[:, :h, :w], y[:, :h, :w], bicubic[:, :h, :w]
        sums["psnr"] += float(psnr(sr, yc))
        sums["ssim"] += float(ssim(sr, yc))
        sums["vif"] += float(vif(sr, yc))
        sums["bicubic_psnr"] += float(psnr(bc, yc))
        sums["bicubic_ssim"] += float(ssim(bc, yc))
        sums["bicubic_vif"] += float(vif(bc, yc))

    n = len(ds)
    print(f"Validated {n} image pairs at {ratio}X:")
    print(
        f"  model:   PSNR {sums['psnr'] / n:.3f}  SSIM {sums['ssim'] / n:.4f}  "
        f"VIF {sums['vif'] / n:.4f}"
    )
    print(
        f"  bicubic: PSNR {sums['bicubic_psnr'] / n:.3f}  "
        f"SSIM {sums['bicubic_ssim'] / n:.4f}  VIF {sums['bicubic_vif'] / n:.4f}"
    )


if __name__ == "__main__":
    main()
