"""Side-by-side comparison CLI: bicubic vs model output for one image.

Reference: test_compare.py (interactive matplotlib grid + save prompt).
This version writes a PNG grid non-interactively (matplotlib optional —
falls back to saving the two halves side by side with PIL).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.models import ControlVector, MewZoomCtrl
from ultrazoom_tpu.ops import upsample2d


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU test comparison")
    p.add_argument("--image_path", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--output_path", default="./comparison.png")
    p.add_argument("--gaussian_blur", type=float, default=0.5)
    p.add_argument("--gaussian_noise", type=float, default=0.5)
    p.add_argument("--jpeg_compression", type=float, default=0.5)
    p.add_argument("--tile", type=int, default=None)
    p.add_argument(
        "--compute_dtype", default="bfloat16", choices=("bfloat16", "float32")
    )
    return p


def main(argv=None) -> None:
    from PIL import Image

    args = build_parser().parse_args(argv)
    from ultrazoom_tpu.tools.validate import _load_model

    model = _load_model(args.model_path)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    img = np.asarray(Image.open(args.image_path).convert("RGB"), np.float32) / 255.0
    x = img[None]
    kw = dict(compute_dtype=dtype)
    if args.tile:
        kw["tile"] = args.tile
    if isinstance(model, MewZoomCtrl):
        c = ControlVector(
            args.gaussian_blur, args.gaussian_noise, args.jpeg_compression
        )
        sr = np.asarray(model.upscale(x, c, **kw), np.float32)[0]
    else:
        sr = np.asarray(model.upscale(x, **kw), np.float32)[0]

    bicubic = np.asarray(
        jnp.clip(upsample2d(jnp.asarray(x), model.cfg.upscale_ratio), 0, 1)
    )[0]

    gap = np.ones((sr.shape[0], 8, 3), np.float32)
    grid = np.concatenate([bicubic, gap, sr], axis=1)
    out = Image.fromarray(np.round(grid * 255).astype(np.uint8), "RGB")
    out.save(args.output_path)
    print(
        f"Wrote {args.output_path} (left: bicubic, right: model; "
        f"{model.cfg.upscale_ratio}X, {sr.shape[1]}x{sr.shape[0]})"
    )


if __name__ == "__main__":
    main()
