"""SRGAN evaluation CLI — entry-point parity with the reference eval_GAN.py.

Loads a generator checkpoint (reference-named torch .pth via the importer,
or a tpusr orbax state dir), runs full-image inference at batch 1
(eval_GAN.py:88 "images can be very large"), accumulates PSNR/SSIM/LPIPS,
saves resolved PNGs and the metrics log.

Documented fixes vs the reference (SURVEY.md §7 catalog): metric averages
divide by the number of images actually evaluated (not the raw --num_images
which may be -1, eval_GAN.py:64-66); --factor is an int (not bool,
eval_GAN.py:132); the positional-argument swap of eval_GAN.py:203-210 has no
analog here; tanh output is mapped [-1,1]->[0,255] before the PNG cast.

HR images arrive in [-1,1] (GAN dataset scaling) and metrics are computed in
that domain with torchmetrics' conventions, exactly like the reference.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
import warnings

import numpy as np

from tpusr.cli.common import check_num_images, require_dir, str2bool, timestamp, validate_noise
from tpusr.data.div2k import GANDIV2KDataset
from tpusr.engine.gan import GANTrainConfig, generator_forward
from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.engine.metrics import ssim as ssim_fn
from tpusr.io.checkpoint import (
    import_torch_generator,
    infer_generator_arch,
    load_checkpoint,
    load_torch_state_dict,
)
from tpusr.io.images import save_image, to_uint8
from tpusr.io.logs import save_log
from tpusr.models.lpips import make_lpips
from tpusr.utils.convert import np_to_device


def load_generator(model_path: str, config: GANTrainConfig):
    """torch .pth (reference naming, DDP prefixes stripped) or orbax dir.

    Returns (params_G, stats_G, config) — config's residual_blocks_count is
    corrected to what the checkpoint actually contains (a warning notes the
    mismatch; the reference hard-codes 16 so only our --residual_blocks
    extension can disagree). A shuffle-count mismatch means the checkpoint
    was trained for a different factor — that is a real user error and
    raises with the required --factor.
    """
    n_shuffles = {2: 1, 4: 2, 8: 3, 16: 4}[config.factor]
    if model_path.endswith(".pth"):
        sd = load_torch_state_dict(model_path)
        rb, ns = infer_generator_arch(sd)
    else:
        state = load_checkpoint(model_path)
        rb, ns = infer_generator_arch(state["params_G"])
    if ns != n_shuffles:
        ckpt_factor = {1: 2, 2: 4, 3: 8, 4: 16}[ns]
        raise ValueError(
            f"{model_path} holds a x{ckpt_factor} generator ({ns} pixel-"
            f"shuffle blocks) but --factor/--downsample request "
            f"x{config.factor} ({n_shuffles}); rerun with the factor the "
            f"model was trained for")
    if rb != config.residual_blocks_count:
        warnings.warn(
            f"checkpoint has {rb} residual blocks; overriding "
            f"--residual_blocks {config.residual_blocks_count}")
        config = dataclasses.replace(config, residual_blocks_count=rb)
    if model_path.endswith(".pth"):
        params, stats = import_torch_generator(
            sd, residual_blocks_count=rb, n_shuffles=ns)
    else:
        params, stats = state["params_G"], state["stats_G"]
    return params, stats, config


def evaluate(params_G, stats_G, dataset, out_dir, config: GANTrainConfig,
             save_images=True, spatial_shards: int = 1, tiles: int = 1):
    """GAN_ISR_Batch_eval parity (eval_GAN.py:21-69)."""
    lpips_fn = make_lpips()
    running = {"psnr": 0.0, "ssim": 0.0, "lpips": 0.0}
    n = 0

    if spatial_shards > 1:
        from tpusr.parallel.spatial import sharded_generator_forward
    if tiles > 1:
        from tpusr.parallel.spatial import tiled_generator_forward

    for lr_img, hr_img, name in dataset:
        print(f"Starting on {name}.")
        lr_dev = np_to_device(lr_img)
        hr_dev = np_to_device(hr_img)

        if spatial_shards > 1:
            resolved = sharded_generator_forward(
                params_G, stats_G, lr_dev, config, n_shards=spatial_shards)
        elif tiles > 1:
            # exact single-chip overlap-and-discard tiling for huge images
            resolved = tiled_generator_forward(
                params_G, stats_G, lr_dev, config, n_tiles=tiles)
        else:
            resolved = generator_forward(params_G, stats_G, lr_dev, config,
                                         train=False)

        running["psnr"] += float(psnr_fn(resolved, hr_dev))
        running["ssim"] += float(ssim_fn(resolved, hr_dev, data_range=1.0))
        running["lpips"] += (float(lpips_fn(resolved, hr_dev))
                             if lpips_fn else float("nan"))
        n += 1
        print(f"Done evaluating over {name}.")

        if save_images:
            save_image(to_uint8(np.asarray(resolved), from_range="pm1"),
                       name, out_dir)

    return {
        "avg_psnr": running["psnr"] / max(n, 1),
        "avg_ssim": running["ssim"] / max(n, 1),
        "avg_lpips": running["lpips"] / max(n, 1),
    }, n


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU-native SRGAN evaluation")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--num_images", type=int, default=-1)
    parser.add_argument("--save_images", type=str2bool, default=False)
    parser.add_argument("--noise_type", type=str)
    parser.add_argument("--noise_param", type=float)
    parser.add_argument("--factor", type=int, default=8)
    parser.add_argument("--downsample", type=str2bool, default=False)
    parser.add_argument("--spatial_shards", type=int, default=1,
                        help="shard huge images across N devices (halo exchange)")
    parser.add_argument("--tiles", type=int, default=1,
                        help="single-chip exact overlap-discard tiling into N "
                             "H-tiles (for images too large for one forward)")
    parser.add_argument("--residual_blocks", type=int, default=16)
    parser.add_argument("--legacy_scale", type=str2bool, default=False,
                        help="reproduce the reference's double-/255 image "
                             "scaling bug (dataset.py:151-157)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="activation dtype for inference (params stay "
                             "f32); matches the dip/train_gan flag")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def run(argv=None):
    args = build_parser().parse_args(argv)
    require_dir(args.data_dir)
    require_dir(args.out_dir)
    check_num_images(args.num_images)

    LR_dir = os.path.join(args.data_dir, "DIV2K_valid_LR_x8/")
    HR_dir = os.path.join(args.data_dir, "DIV2K_valid_HR/")

    factor = args.factor
    if args.downsample:
        factor *= 2

    out_dir = os.path.join(args.out_dir, f"out/GANx{factor}/{timestamp()}")
    os.makedirs(out_dir, exist_ok=True)

    noise_type = validate_noise(args)

    print("Starting GAN evaluation..")
    config = GANTrainConfig(factor=factor,
                            residual_blocks_count=args.residual_blocks,
                            dtype=None if args.dtype == "float32" else args.dtype)
    params_G, stats_G, config = load_generator(args.model_path, config)

    dataset = GANDIV2KDataset(
        LR_dir=LR_dir, HR_dir=HR_dir, scale_factor=factor,
        num_images=args.num_images, noise_type=noise_type,
        downsample=args.downsample, train=False, seed=args.seed,
        legacy_scale=args.legacy_scale)

    start_time = time.time()
    eval_metrics, n = evaluate(params_G, stats_G, dataset, out_dir, config,
                               save_images=args.save_images,
                               spatial_shards=args.spatial_shards,
                               tiles=args.tiles)
    runtime = time.time() - start_time

    print(f"Done evaluating for all {n} images.")
    eval_metrics["Number of images evaluated over"] = n
    eval_metrics["Eval runtime"] = time.strftime("%H:%M:%S", time.gmtime(runtime))

    if noise_type is None:
        save_log(out_dir, **eval_metrics)
    else:
        save_log(out_dir, **eval_metrics, **noise_type)
    return eval_metrics


if __name__ == "__main__":
    run()
