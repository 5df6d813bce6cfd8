"""Generate a structured synthetic DIV2K-style dataset (no-egress stand-in).

Real DIV2K is unavailable in this environment, but SR quality evidence needs
images with learnable statistics — edges, textures, smooth regions — not
white noise (which is unlearnable: the x8 downsample destroys all of it).
Each image here mixes:

  * multi-octave smoothed value noise (bicubic-upsampled random fields with
    a 1/f amplitude spectrum) — natural-image-like texture;
  * anti-aliased random ellipses / rectangles — sharp edges at all
    orientations (the structures SR actually has to hallucinate);
  * a global color gradient — low-frequency shading.

LR is the DIV2K convention: PIL bicubic x8 downscale of the HR, saved as
`<name>x8.png` beside `DIV2K_<split>_HR/<name>.png` (dataset.py:18 naming).

Usage: python tools/make_synth_div2k.py OUT_DIR [--n_train 16] [--n_valid 4]
       [--size 512] [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _value_noise(rng: np.random.Generator, size: int) -> np.ndarray:
    """Multi-octave smoothed noise in [0,1], (size, size, 3)."""
    img = np.zeros((size, size, 3), np.float32)
    amp_total = 0.0
    cells = 4
    octave = 0
    while cells <= size:
        amp = 1.0 / (1.6 ** octave)
        field = rng.random((cells, cells, 3)).astype(np.float32)
        up = np.asarray(
            Image.fromarray((field * 255).astype(np.uint8)).resize(
                (size, size), Image.BICUBIC), np.float32) / 255.0
        img += amp * up
        amp_total += amp
        cells *= 2
        octave += 1
    return img / amp_total


def _draw_shapes(rng: np.random.Generator, img: np.ndarray, n: int) -> np.ndarray:
    """Alpha-blend n anti-aliased ellipses/rectangles with random colors."""
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(n):
        cx, cy = rng.uniform(0, size, 2)
        a, b = rng.uniform(size * 0.03, size * 0.25, 2)
        theta = rng.uniform(0, np.pi)
        color = rng.random(3).astype(np.float32)
        alpha = rng.uniform(0.5, 1.0)
        ct, st = np.cos(theta), np.sin(theta)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        if rng.random() < 0.5:  # ellipse
            d = np.sqrt((u / a) ** 2 + (v / b) ** 2) - 1.0
            edge = np.clip(0.5 - d * max(a, b), 0.0, 1.0)  # ~1px AA edge
        else:  # rectangle
            d = np.maximum(np.abs(u) - a, np.abs(v) - b)
            edge = np.clip(0.5 - d, 0.0, 1.0)
        mask = (alpha * edge)[..., None]
        img = img * (1 - mask) + color * mask
    return img


def make_image(rng: np.random.Generator, size: int) -> np.ndarray:
    img = _value_noise(rng, size)
    # global gradient
    g = np.linspace(0, 1, size, dtype=np.float32)
    direction = rng.random(3) - 0.5
    img = img * 0.7 + 0.3 * (0.5 + g[None, :, None] * direction[None, None])
    img = _draw_shapes(rng, img, n=int(rng.integers(8, 20)))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--n_train", type=int, default=16)
    p.add_argument("--n_valid", type=int, default=4)
    p.add_argument("--size", type=int, default=512, help="HR height")
    p.add_argument("--width", type=int, default=0,
                   help="HR width (default: square = --size)")
    p.add_argument("--jitter", type=int, default=0,
                   help="random per-image +/- pixels on each HR dim "
                        "(multiples of 16; mixed shapes exercise buckets)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("valid", args.n_valid)):
        hr_dir = os.path.join(args.out_dir, f"DIV2K_{split}_HR")
        lr_dir = os.path.join(args.out_dir, f"DIV2K_{split}_LR_x8")
        os.makedirs(hr_dir, exist_ok=True)
        os.makedirs(lr_dir, exist_ok=True)
        for i in range(1, n + 1):
            name = f"{i:04d}"
            h = args.size
            w = args.width or args.size
            if args.jitter:
                h += 16 * int(rng.integers(-args.jitter // 16,
                                           args.jitter // 16 + 1))
                w += 16 * int(rng.integers(-args.jitter // 16,
                                           args.jitter // 16 + 1))
            hr = make_image(rng, max(h, w))[:h, :w]
            Image.fromarray(hr).save(os.path.join(hr_dir, f"{name}.png"))
            lr = Image.fromarray(hr).resize((w // 8, h // 8), Image.BICUBIC)
            lr.save(os.path.join(lr_dir, f"{name}x8.png"))
    print(f"wrote {args.n_train} train + {args.n_valid} valid ~{args.size}x"
          f"{args.width or args.size} (jitter {args.jitter}) images under "
          f"{args.out_dir}")


if __name__ == "__main__":
    main()
