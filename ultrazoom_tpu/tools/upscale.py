"""Upscale image files from the command line.

The reference exposes one-image inference only through Python
(`pretrained_example.ipynb`, `/root/reference/README.md:74-129`) or the
exported ONNX graph; its only CLI renders a comparison grid
(`/root/reference/test_compare.py`).  This is the missing plain
"LR in, SR out" surface: one file or a whole directory, through the
same engine options the API exposes (overlap-tile streaming for large
images, x8 geometric self-ensemble, control vector for Ctrl models).

    python -m ultrazoom_tpu.tools.upscale \
        --model_path artifacts/mewzoom-tpu-2x-unet \
        --image_path photo.png --output_path photo_2x.png

    python -m ultrazoom_tpu.tools.upscale \
        --model_path artifacts/mewzoom-tpu-4x-ctrl \
        --image_path ./lr_frames/ --output_path ./sr_frames/ \
        --gaussian_blur 0.5 --jpeg_compression 0.4 --tile 512
"""

from __future__ import annotations

import argparse
import pathlib
import time

import numpy as np

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".webp", ".gif", ".bmp"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU image upscaler")
    p.add_argument("--model_path", required=True,
                   help="HF-style artifact dir or trainer checkpoint dir")
    p.add_argument("--image_path", required=True,
                   help="image file, or a directory of images")
    p.add_argument("--output_path", required=True,
                   help="output file (single image) or directory")
    p.add_argument("--gaussian_blur", type=float, default=0.0,
                   help="Ctrl models: blur strength hint in [0,1] (default 0)")
    p.add_argument("--gaussian_noise", type=float, default=0.0,
                   help="Ctrl models: noise strength hint in [0,1] (default 0)")
    p.add_argument("--jpeg_compression", type=float, default=0.0,
                   help="Ctrl models: JPEG strength hint in [0,1] (default 0)")
    p.add_argument("--tile", type=int, default=None,
                   help="stream through the overlap-tile engine with this "
                        "tile size (use for images too large for one graph)")
    p.add_argument("--overlap", type=int, default=None,
                   help="tile overlap in pixels (default: engine's "
                        "receptive-field halo)")
    p.add_argument("--self_ensemble", action="store_true",
                   help="average the x8 geometric TTA views (~8x FLOPs)")
    p.add_argument("--batch", type=int, default=8,
                   help="directory mode: same-size images ride the batch "
                        "axis in groups of this many (whole-image path "
                        "only; the tile engine batches tiles itself)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    return p


def _iter_inputs(path: pathlib.Path):
    if path.is_dir():
        files = sorted(
            f for f in path.rglob("*")
            if f.is_file() and f.suffix.lower() in IMAGE_EXTS
        )
        if not files:
            raise SystemExit(f"no images under {path}")
        return files
    if not path.is_file():
        raise SystemExit(f"{path}: no such file or directory")
    return [path]


def main(argv=None) -> None:
    from PIL import Image

    import jax.numpy as jnp

    from ultrazoom_tpu.models import ControlVector, MewZoomCtrl
    from ultrazoom_tpu.tools.validate import _load_model

    args = build_parser().parse_args(argv)
    model = _load_model(args.model_path)
    ratio = model.cfg.upscale_ratio
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    src = pathlib.Path(args.image_path)
    dst = pathlib.Path(args.output_path)
    inputs = _iter_inputs(src)
    if len(inputs) > 1 or dst.is_dir() or dst.suffix.lower() not in IMAGE_EXTS:
        dst.mkdir(parents=True, exist_ok=True)
        outputs = [dst / f"{f.stem}_{ratio}x.png" for f in inputs]
    else:
        dst.parent.mkdir(parents=True, exist_ok=True)
        outputs = [dst]

    kw: dict = dict(compute_dtype=dtype, self_ensemble=args.self_ensemble)
    if args.tile is not None:
        kw["tile"] = args.tile
        if args.overlap is not None:
            kw["overlap"] = args.overlap
    elif args.overlap is not None:
        raise SystemExit("--overlap requires --tile")
    if isinstance(model, MewZoomCtrl) and model.cfg.controllable:
        kw["c"] = ControlVector(
            args.gaussian_blur, args.gaussian_noise, args.jpeg_compression
        )

    def save(sr, in_path, out_path, in_shape, dt):
        Image.fromarray(
            np.round(np.clip(sr, 0.0, 1.0) * 255).astype(np.uint8), "RGB"
        ).save(out_path)
        print(
            f"{in_path} {in_shape[1]}x{in_shape[0]} -> {out_path} "
            f"{sr.shape[1]}x{sr.shape[0]} ({ratio}X, {dt:.2f}s)"
        )

    # Whole-image path: group same-size images so they ride the batch
    # axis (the anchor dispatcher decomposes any group size into
    # known-fast compiled shapes).  The tile engine batches tiles itself,
    # so tiled mode stays one image per call.
    batch_cap = max(1, args.batch) if args.tile is None else 1
    pending: list[tuple] = []  # (in_path, out_path, img)

    def flush():
        if not pending:
            return
        x = np.stack([img for _, _, img in pending])
        t0 = time.perf_counter()
        sr = np.asarray(model.upscale(x, **kw), np.float32)
        dt = (time.perf_counter() - t0) / len(pending)
        for (in_path, out_path, img), s in zip(pending, sr):
            save(s, in_path, out_path, img.shape, dt)
        pending.clear()

    for in_path, out_path in zip(inputs, outputs):
        img = np.asarray(Image.open(in_path).convert("RGB"), np.float32) / 255.0
        if batch_cap == 1:
            t0 = time.perf_counter()
            sr = np.asarray(model.upscale(img[None], **kw), np.float32)[0]
            save(sr, in_path, out_path, img.shape, time.perf_counter() - t0)
            continue
        if pending and pending[0][2].shape != img.shape:
            flush()
        pending.append((in_path, out_path, img))
        if len(pending) >= batch_cap:
            flush()
    flush()


if __name__ == "__main__":
    main()
