"""Bicubic-upscale baseline metrics on a DIV2K-style valid split.

The quality-evidence bar for a trained SRGAN generator: it must beat plain
bicubic x`factor` upscaling (PIL, the same resampler the dataset pipeline
uses) on held-out images, measured with the repo's own PSNR/SSIM in the
GAN's [-1,1] HR domain (identical conventions to tpusr/cli/eval_gan.py).

Usage: python tools/bicubic_baseline.py DATA_DIR [--split valid] [--factor 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Host-side tool (PIL resize + metric reductions): CPU, never the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

from tpusr.data.div2k import GANDIV2KDataset
from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.engine.metrics import ssim as ssim_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir")
    p.add_argument("--split", default="valid")
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--downsample", action="store_true",
                   help="x16 configuration: the x8 LR is bicubic-halved "
                        "again and the factor doubles (same convention as "
                        "cli/eval_gan.py: pass --factor 8 --downsample)")
    args = p.parse_args()
    # mirror cli/eval_gan.py (and eval_GAN.py:154-156): --downsample doubles
    # the factor, so the two tools share one flag interface
    factor = args.factor * 2 if args.downsample else args.factor

    dataset = GANDIV2KDataset(
        LR_dir=os.path.join(args.data_dir, f"DIV2K_{args.split}_LR_x8/"),
        HR_dir=os.path.join(args.data_dir, f"DIV2K_{args.split}_HR/"),
        scale_factor=factor, downsample=args.downsample, train=False)

    psnrs, ssims = [], []
    for lr, hr, name in dataset:
        # lr [0,1], hr [-1,1] (GAN domain). Bicubic upscale on the host.
        h, w = hr.shape[0], hr.shape[1]
        lr_img = Image.fromarray((np.clip(lr, 0, 1) * 255).astype(np.uint8))
        up = np.asarray(lr_img.resize((w, h), Image.BICUBIC), np.float32) / 255.0
        up = up * 2.0 - 1.0  # same [-1,1] mapping as the generator output
        pv = float(psnr_fn(up[None], hr[None]))
        sv = float(ssim_fn(up[None], hr[None]))
        psnrs.append(pv)
        ssims.append(sv)
        print(f"{name}: bicubic PSNR {pv:.3f} dB  SSIM {sv:.4f}")
    print(f"mean over {len(psnrs)}: PSNR {np.mean(psnrs):.3f} dB  "
          f"SSIM {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
