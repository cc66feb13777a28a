"""Generate an offline training dataset: real bundled photos + procedural
textures.

The reference trains on a user-supplied image folder (README.md:232-247);
this air-gapped environment has no photo corpus, so this tool builds one
from (a) the few real photographs bundled with installed packages
(sklearn's china/flower, matplotlib's grace_hopper — ~50 distinct 384^2
crops with flips/rotations) and (b) procedurally generated images chosen
for the statistics SR training needs: broadband 1/f^a spectra, hard edges,
thin lines, periodic textures, and text-like glyphs.

Usage::

    python -m ultrazoom_tpu.tools.make_demo_dataset --out ./dataset \
        --n_train 240 --n_test 24
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def _real_photos():
    imgs = []
    try:
        from sklearn.datasets import load_sample_images

        imgs += [i.astype(np.float32) / 255.0 for i in load_sample_images().images]
    except Exception:
        pass
    try:
        import matplotlib

        p = (
            pathlib.Path(matplotlib.get_data_path())
            / "sample_data" / "grace_hopper.jpg"
        )
        from PIL import Image

        imgs.append(np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0)
    except Exception:
        pass
    return imgs


def _fractal_noise(rng, size, alpha=None):
    """1/f^alpha random-phase field per channel — natural-image spectrum."""
    alpha = alpha if alpha is not None else rng.uniform(1.0, 2.5)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    amp = f ** (-alpha / 2.0)
    out = np.empty((size, size, 3), np.float32)
    for c in range(3):
        phase = rng.uniform(0, 2 * np.pi, amp.shape)
        spec = amp * np.exp(1j * phase)
        img = np.fft.irfft2(spec, s=(size, size))
        img = (img - img.min()) / (np.ptp(img) + 1e-9)
        out[..., c] = img
    # Correlate channels (natural images are strongly luma-dominant).
    mix = rng.uniform(0.5, 1.0)
    luma = out.mean(-1, keepdims=True)
    return mix * luma + (1 - mix) * out


def _voronoi(rng, size, n=None):
    n = n or rng.integers(20, 120)
    pts = rng.uniform(0, size, (n, 2)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    best = np.full((size, size), np.inf, np.float32)
    idx = np.zeros((size, size), np.int32)
    for i, (py, px) in enumerate(pts):
        d = (yy - py) ** 2 + (xx - px) ** 2
        m = d < best
        best[m] = d[m]
        idx[m] = i
    return colors[idx]

def _shapes(rng, size):
    from PIL import Image, ImageDraw

    im = Image.new("RGB", (size, size), tuple(rng.integers(0, 255, 3)))
    dr = ImageDraw.Draw(im)
    for _ in range(rng.integers(15, 60)):
        kind = rng.integers(0, 4)
        x0, y0 = rng.integers(0, size, 2)
        w, h = rng.integers(4, size // 2, 2)
        col = tuple(rng.integers(0, 255, 3))
        if kind == 0:
            dr.rectangle([x0, y0, x0 + w, y0 + h], fill=col)
        elif kind == 1:
            dr.ellipse([x0, y0, x0 + w, y0 + h], fill=col)
        elif kind == 2:
            x1, y1 = rng.integers(0, size, 2)
            dr.line([x0, y0, x1, y1], fill=col, width=int(rng.integers(1, 6)))
        else:
            dr.text((x0, y0), "Zx8Qa3kR"[: rng.integers(2, 8)], fill=col)
    return np.asarray(im, np.float32) / 255.0


def _gratings(rng, size):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.zeros((size, size, 3), np.float32)
    for _ in range(rng.integers(2, 5)):
        f = rng.uniform(2, 60)
        th = rng.uniform(0, np.pi)
        ph = rng.uniform(0, 2 * np.pi)
        g = 0.5 + 0.5 * np.sin(
            2 * np.pi * f * (xx * np.cos(th) + yy * np.sin(th)) + ph
        )
        col = rng.uniform(0.2, 1.0, 3)
        out += g[..., None] * col[None, None]
    return out / out.max()


def _compose(rng, size):
    gens = [_fractal_noise, _voronoi, _shapes, _gratings]
    k = rng.integers(1, 3)
    img = gens[rng.integers(0, len(gens))](rng, size)
    for _ in range(k):
        other = gens[rng.integers(0, len(gens))](rng, size)
        a = rng.uniform(0.2, 0.8)
        if rng.uniform() < 0.5:
            img = a * img + (1 - a) * other
        else:  # spatially varying mask: keeps hard boundaries
            mask = (_fractal_noise(rng, size, 2.0)[..., :1] > 0.5).astype(np.float32)
            img = mask * img + (1 - mask) * other
    return np.clip(img, 0, 1)


def _photo_crops(rng, photos, size):
    crops = []
    for im in photos:
        h, w = im.shape[:2]
        s = min(size, h, w)
        for _ in range(12):
            y = rng.integers(0, h - s + 1)
            x = rng.integers(0, w - s + 1)
            c = im[y : y + s, x : x + s]
            if rng.uniform() < 0.5:
                c = c[:, ::-1]
            c = np.rot90(c, rng.integers(0, 4))
            crops.append(np.ascontiguousarray(c))
    return crops


def make_dataset(out, n_train=240, n_test=24, size=512, seed=0) -> tuple[int, int]:
    from PIL import Image

    out = pathlib.Path(out)
    rng = np.random.default_rng(seed)
    photos = _real_photos()
    crops = _photo_crops(rng, photos, size) if photos else []

    counts = []
    for split, n in (("train", n_train), ("test", n_test)):
        d = out / split
        d.mkdir(parents=True, exist_ok=True)
        # Disjoint photo crops between splits.
        n_photo = min(len(crops), max(1, n // 6)) if crops else 0
        split_crops = [crops.pop() for _ in range(n_photo)] if crops else []
        for i in range(n):
            img = (
                split_crops[i]
                if i < len(split_crops)
                else _compose(rng, size)
            )
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                d / f"{split}_{i:04d}.png"
            )
        counts.append(n)
    return tuple(counts)


def make_validation_pairs(
    hr_dir, out_dir, ratio=4, blur=0.5, noise=0.05, jpeg=0.4, seed=0
) -> int:
    """Materialize deterministic LR/HR folders from an HR image folder for
    tools/validate.py (the reference's ImagePairs eval surface): fixed
    degradation strengths, bicubic downsample, real JPEG round-trip."""
    from PIL import Image

    from ultrazoom_tpu.data.degradations import (
        _gaussian_noise_u8,
        _jpeg_u8,
        gaussian_blur_u8,
        resize_u8,
    )

    hr_dir, out_dir = pathlib.Path(hr_dir), pathlib.Path(out_dir)
    (out_dir / "lr").mkdir(parents=True, exist_ok=True)
    (out_dir / "hr").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = 0
    for p in sorted(hr_dir.iterdir()):
        if p.suffix.lower() not in (".png", ".jpg", ".jpeg", ".webp"):
            continue
        hr = np.asarray(Image.open(p).convert("RGB"))
        h = hr.shape[0] - hr.shape[0] % ratio
        w = hr.shape[1] - hr.shape[1] % ratio
        hr = hr[:h, :w]
        img = gaussian_blur_u8(hr, blur)
        img = _gaussian_noise_u8(img, noise, rng)
        img = resize_u8(img, (h // ratio, w // ratio), "bicubic")
        img = _jpeg_u8(img, int(100 * (1.0 - jpeg)))
        Image.fromarray(hr).save(out_dir / "hr" / f"{p.stem}.png")
        Image.fromarray(img).save(out_dir / "lr" / f"{p.stem}.png")
        n += 1
    return n


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=240)
    p.add_argument("--n_test", type=int, default=24)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--pairs_from", default=None,
        help="instead of generating: build fixed-degradation LR/HR pairs "
        "from this HR folder into --out/{lr,hr}",
    )
    p.add_argument("--ratio", type=int, default=4)
    p.add_argument("--blur", type=float, default=0.5)
    p.add_argument("--noise", type=float, default=0.05)
    p.add_argument("--jpeg", type=float, default=0.4)
    args = p.parse_args(argv)
    if args.pairs_from:
        n = make_validation_pairs(
            args.pairs_from, args.out, args.ratio, args.blur, args.noise,
            args.jpeg, args.seed,
        )
        print(f"Wrote {n} LR/HR pairs (x{args.ratio}) to {args.out}")
        return
    tr, te = make_dataset(args.out, args.n_train, args.n_test, args.size, args.seed)
    print(f"Wrote {tr} train + {te} test images ({args.size}x{args.size}) to {args.out}")


if __name__ == "__main__":
    main()
