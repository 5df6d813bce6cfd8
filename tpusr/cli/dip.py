"""DIP super-resolution CLI — entry-point parity with the reference DIP.py.

Usage (flags mirror DIP.py:236-248):
    python -m tpusr.cli.dip --data_dir D --out_dir O --num_iter 1000 \
        [--train_log_freq 100] [--save_output True] [--num_images 1] \
        [--noise_type gauss --noise_param 0.05] [--downsample True]

Differences from the reference, all documented in SURVEY.md §7:
  * the whole optimization runs as one jitted program per image;
  * boolean flags parse their value;
  * LPIPS logs NaN unless $TPUSR_LPIPS_WEIGHTS points at converted weights.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.cli.common import check_num_images, str2bool, timestamp, validate_noise
from tpusr.data.div2k import DIV2KDataset
from tpusr.engine.dip import (
    DIPConfig,
    dip_superresolve,
    dip_superresolve_bucketed,
    pad_to_bucket,
)
from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.engine.metrics import ssim as ssim_fn
from tpusr.io.images import save_image, to_uint8
from tpusr.io.logs import save_log
from tpusr.models.lpips import make_lpips
from tpusr.utils.convert import np_to_device


def _pad_pair(lr_img, hr_img, bucket, factor):
    hr_pad, (h, w) = pad_to_bucket(hr_img, bucket)
    lth, ltw = hr_pad.shape[0] // factor, hr_pad.shape[1] // factor
    lr_pad = np.pad(lr_img, ((0, lth - lr_img.shape[0]),
                             (0, ltw - lr_img.shape[1]), (0, 0)))
    return lr_pad, hr_pad, (h, w)


def main(LR_dir, HR_dir, out_dir, factor, num_images, config: DIPConfig,
         save_output, noise_type, downsample, seed=0, bucket=0,
         batch_images=1):
    dataset = DIV2KDataset(LR_dir=LR_dir, HR_dir=HR_dir, scale_factor=factor,
                           num_images=num_images, noise_type=noise_type,
                           downsample=downsample, seed=seed)
    n = len(dataset)
    print(f"Performing DIP SISR on {n} images.")
    print(f"Output directory: {out_dir}")

    lpips_fn = make_lpips()

    running = {"psnr": 0.0, "ssim": 0.0, "lpips": 0.0}
    n_points = config.num_iter // config.log_freq
    curves = {
        "Average PSNR per epoch": np.zeros(n_points),
        "Average SSIM per epoch": np.zeros(n_points),
        "Average LPIPS per epoch": np.zeros(n_points),
    }

    key = jax.random.key(seed)
    start_time = time.time()

    def account(resolved, image_curves, lr_img, hr_img, name):
        hr_dev = np_to_device(hr_img)
        running["psnr"] += float(psnr_fn(resolved, hr_dev))
        running["ssim"] += float(ssim_fn(resolved, hr_dev, data_range=1.0))
        running["lpips"] += (float(lpips_fn(resolved, hr_dev))
                             if lpips_fn else float("nan"))
        curves["Average PSNR per epoch"] += np.asarray(image_curves["psnr"])
        curves["Average SSIM per epoch"] += np.asarray(image_curves["ssim"])
        curves["Average LPIPS per epoch"] += np.asarray(image_curves["lpips"])
        for i, (p, s) in enumerate(zip(np.asarray(image_curves["psnr"]),
                                       np.asarray(image_curves["ssim"]))):
            print(f"Iteration {i * config.log_freq + 1}/{config.num_iter}: "
                  f"PSNR: {p:.4f} SSIM: {s:.4f}")
        if save_output:
            print("Done.")
            # quantize on device: the PNG download ships 1 byte/channel
            res_u8 = np.asarray(jnp.clip(jnp.round(resolved * 255.0),
                                         0, 255).astype(jnp.uint8))
            save_image(res_u8[0] if res_u8.ndim == 4 else res_u8,
                       f"{name}_resolved", out_dir)
            save_image(to_uint8(lr_img), f"{name}_LR", out_dir)
            save_image(to_uint8(hr_img), f"{name}_HR", out_dir)

    if batch_images > 1:
        # grouped DIP over same-bucket images: ONE dispatch per group,
        # sequential on-device execution (lax.map — measured faster per
        # image than vmap lanes on TPU, DESIGN.md); partial groups are
        # padded by repeating the last image, extras dropped
        from tpusr.engine.dip import dip_superresolve_scan_bucketed

        groups: dict[tuple, list] = {}

        def flush(shape_key):
            items = groups.pop(shape_key)
            real = len(items)
            while len(items) < batch_images:
                items.append(items[-1])
            lr_b = np.stack([it[0][None] for it in items])
            hr_b = np.stack([it[1][None] for it in items])
            valid = np.asarray([it[2] for it in items], np.int32)
            nonlocal key
            key, k = jax.random.split(key)
            keys = jax.random.split(k, batch_images)
            t0 = time.time()
            res_b, curves_b = dip_superresolve_scan_bucketed(
                jnp.asarray(lr_b), jnp.asarray(hr_b), valid, keys, config,
                lpips_fn)
            res_b.block_until_ready()
            print(f"Batch of {real} images runtime: {time.time() - t0:.2f}s")
            for lane in range(real):
                _, _, (h, w), lr_img, hr_img, name = items[lane]
                lane_curves = {k2: np.asarray(v)[lane]
                               for k2, v in curves_b.items()}
                account(res_b[lane][:, :h, :w], lane_curves, lr_img, hr_img,
                        name)

        for idx, (lr_img, hr_img, name) in enumerate(dataset):
            print(f"Queueing {name} (image {idx + 1}/{n}).")
            lr_u8 = np.round(lr_img * 255.0).astype(np.uint8)
            hr_u8 = np.round(hr_img * 255.0).astype(np.uint8)
            lr_pad, hr_pad, (h, w) = _pad_pair(lr_u8, hr_u8, bucket, factor)
            skey = hr_pad.shape
            groups.setdefault(skey, []).append(
                (lr_pad, hr_pad, (h, w), lr_img, hr_img, name))
            if len(groups[skey]) == batch_images:
                flush(skey)
        for skey in list(groups):
            flush(skey)
    else:
        for idx, (lr_img, hr_img, name) in enumerate(dataset):
            print(f"Starting on {name} (image {idx + 1}/{n}) "
                  f"for {config.num_iter} iterations.")
            key, k_img = jax.random.split(key)

            t0 = time.time()
            lr_u8 = np.round(lr_img * 255.0).astype(np.uint8)
            hr_u8 = np.round(hr_img * 255.0).astype(np.uint8)
            if bucket:
                # one XLA program per size bucket instead of per unique shape
                lr_pad, hr_pad, (h, w) = _pad_pair(lr_u8, hr_u8, bucket, factor)
                resolved, image_curves = dip_superresolve_bucketed(
                    np_to_device(lr_pad, None), np_to_device(hr_pad, None),
                    np.asarray([h, w], np.int32), k_img, config, lpips_fn)
                resolved = resolved[:, :h, :w]
            else:
                resolved, image_curves = dip_superresolve(
                    np_to_device(lr_u8, None), np_to_device(hr_u8, None),
                    k_img, config, lpips_fn)
            resolved.block_until_ready()
            print(f"Image runtime: {time.time() - t0:.2f}s")
            account(resolved, image_curves, lr_img, hr_img, name)

    print(f"Done for all {n} images.")

    metrics = dict(curves)
    metrics["runtime"] = time.time() - start_time
    metrics["Average final PSNR"] = running["psnr"] / n
    metrics["Average final SSIM"] = running["ssim"] / n
    metrics["Average final LPIPS"] = running["lpips"] / n
    metrics["Number of images evaluated over"] = n
    for k in curves:
        metrics[k] = metrics[k] / n

    if noise_type is None:
        save_log(out_dir, **metrics)
    else:
        save_log(out_dir, **metrics, **noise_type)
    return metrics


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU-native DIP super-resolution")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--num_iter", type=int, default=1)
    parser.add_argument("--train_log_freq", type=int, default=100)
    parser.add_argument("--save_output", type=str2bool, default=False)
    parser.add_argument("--num_images", type=int, default=1)
    parser.add_argument("--noise_type", type=str)
    parser.add_argument("--noise_param", type=float)
    parser.add_argument("--downsample", type=str2bool, default=False)
    parser.add_argument("--seed", type=int, default=0)
    # net hyperparameters (get_net's code-level knobs, DIP.py:169-174 defaults)
    parser.add_argument("--input_depth", type=int, default=32)
    parser.add_argument("--num_scales", type=int, default=5)
    parser.add_argument("--skip_n33d", type=int, default=128)
    parser.add_argument("--skip_n33u", type=int, default=128)
    parser.add_argument("--skip_n11", type=int, default=4)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="activation compute dtype (params stay f32)")
    # library-surface knobs the reference hardcodes at DIP.py:316-326
    # (OPTIMIZER='adam', INPUT='noise', OPT_OVER='net'; utils/DIP.py exposes
    # lbfgs / meshgrid / input,down as code-level options)
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=["adam", "lbfgs"])
    parser.add_argument("--lbfgs_line_search", type=str, default="zoom",
                        choices=["zoom", "fixed"],
                        help="'fixed' = torch-exact LBFGS stepping (lr as a "
                             "fixed step, no linesearch — utils/DIP.py:30 "
                             "parity); 'zoom' = strong-Wolfe linesearch "
                             "(better conditioned; supersedes lr)")
    parser.add_argument("--input_method", type=str, default="noise",
                        choices=["noise", "meshgrid"])
    parser.add_argument("--opt_over", type=str, default="net",
                        help="comma-set of net,input,down (utils/DIP.py:44-68)")
    parser.add_argument("--resolve_clean", type=str2bool, default=False,
                        help="resolve the final image with the un-noised "
                             "input (the reference keeps the last reg-noise "
                             "draw, DIP.py:102)")
    parser.add_argument("--bucket", type=int, default=0,
                        help="pad images to multiples of this (must be a "
                             "multiple of the factor); 0 = exact shapes. "
                             "Avoids one jit compile per unique image shape")
    parser.add_argument("--batch_images", type=int, default=1,
                        help="process N same-bucket images per dispatch "
                             "(sequential on-device lax.map; requires "
                             "--bucket). Amortizes per-dispatch overhead "
                             "without the grouped-conv vmap penalty")
    parser.add_argument("--profile_dir", type=str,
                        help="emit a jax.profiler trace to this directory")
    parser.add_argument("--conv_fusion", type=str, default="auto",
                        choices=["auto", "off"],
                        help="Pallas fused conv+BN+act dataflow (auto: on "
                             "for TPU backends; off: pure XLA)")
    return parser


def run(argv=None):
    args = build_parser().parse_args(argv)

    if not os.path.isdir(args.out_dir):
        print(f"{args.out_dir} not found.")
        sys.exit(1)

    LR_dir = os.path.join(args.data_dir, "DIV2K_train_LR_x8/")
    HR_dir = os.path.join(args.data_dir, "DIV2K_train_HR/")
    check_num_images(args.num_images)

    factor = 8  # DIP.py:271
    if args.downsample:
        factor *= 2

    out_dir = os.path.join(args.out_dir, f"out/DIPx{factor}/{timestamp()}")
    noise_type = validate_noise(args)
    if noise_type:
        param = noise_type.get("std", noise_type.get("s"))
        out_dir = os.path.join(out_dir, f"{noise_type['type']}/{param}")
    os.makedirs(out_dir, exist_ok=True)

    config = DIPConfig(
        factor=factor,
        num_iter=args.num_iter,
        learning_rate=0.01,                       # DIP.py:318
        reg_noise_std=0.07 if args.downsample else 0.05,  # DIP.py:320-323
        log_freq=args.train_log_freq,
        input_depth=args.input_depth,
        num_scales=args.num_scales,
        skip_n33d=args.skip_n33d,
        skip_n33u=args.skip_n33u,
        skip_n11=args.skip_n11,
        dtype=args.dtype,
        optimizer=args.optimizer,
        lbfgs_line_search=args.lbfgs_line_search,
        input_method=args.input_method,
        opt_over=args.opt_over,
        resolve_clean=args.resolve_clean,
        conv_fusion=args.conv_fusion,
    )
    if args.bucket and args.bucket % factor != 0:
        print(f"--bucket must be a multiple of the scale factor ({factor})")
        sys.exit(1)
    if args.batch_images > 1 and not args.bucket:
        print("--batch_images requires --bucket (lanes must share a canvas)")
        sys.exit(1)

    from tpusr.utils.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        main(LR_dir, HR_dir, out_dir, factor, args.num_images, config,
             args.save_output, noise_type, args.downsample, args.seed,
             bucket=args.bucket, batch_images=args.batch_images)


if __name__ == "__main__":
    run()
