"""SRGAN training CLI — entry-point parity with the reference train_GAN.py.

Two-phase schedule (train_GAN.py:180-205): pre-train then fine-tune, each
with a fresh Adam; saves generator/discriminator checkpoints (orbax native +
reference-named .pth export) and a metrics log after each phase.

Extra over the reference (SURVEY.md §5): --resume restores a full
{params, opt_state, step} orbax checkpoint, and periodic checkpointing gives
crash-resume; --legacy_detach reproduces the reference's G-detach bug.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import jax

from tpusr.cli.common import check_num_images, require_dir, str2bool, timestamp
from tpusr.data.div2k import GANDIV2KDataset, batch_iterator
from tpusr.engine.gan import (
    GANTrainConfig,
    create_gan_state,
    gan_train_step,
    generator_forward,
)
from tpusr.engine.losses import make_content_loss
from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.engine.metrics import ssim as ssim_fn
from tpusr.io.checkpoint import (
    export_torch_discriminator,
    export_torch_generator,
    load_checkpoint,
    save_checkpoint,
    save_torch_pth,
)
from tpusr.io.logs import save_log
from tpusr.models.lpips import make_lpips
from tpusr.models.vgg19 import try_load_vgg19


def train_phase(state, dataset, config: GANTrainConfig, lr, num_epoch,
                train_log_freq, content_loss, lpips_fn, ckpt_dir=None,
                ckpt_every=0, step_fn=None):
    """GAN_ISR_train parity (train_GAN.py:22-136)."""
    print("Starting GAN training..")
    if step_fn is None:
        step_fn = lambda s, lb, hb: gan_train_step(s, lb, hb, config, lr,
                                                   content_loss)
    avg_psnrs, avg_ssims, avg_lpipss = [], [], []
    losses_D, losses_G = [], []

    for epoch in range(num_epoch):
        start_time = time.time()
        dataset.set_epoch(epoch)
        epoch_psnrs, epoch_ssims, epoch_lpipss = [], [], []
        batches = 0

        # pad_to_full: one jitted shape regardless of N % B (the ragged
        # final batch would otherwise trigger a second multi-minute compile)
        for lr_b, hr_b, _ in batch_iterator(dataset, config.batch_size,
                                            pad_to_full=True):
            state, logs = step_fn(state, lr_b, hr_b)
            losses_D.append(float(logs["loss_D"]))
            losses_G.append(float(logs["loss_G"]))
            batches += 1

            if epoch % train_log_freq == 0:
                out = generator_forward(state.params_G, state.stats_G, lr_b,
                                        config, train=True)
                epoch_psnrs.append(float(psnr_fn(out, hr_b)))
                epoch_ssims.append(float(ssim_fn(out, hr_b, data_range=1.0)))
                epoch_lpipss.append(float(lpips_fn(out, hr_b))
                                    if lpips_fn else float("nan"))

        if epoch % train_log_freq == 0:
            avg_psnrs.append(sum(epoch_psnrs) / batches)
            avg_ssims.append(sum(epoch_ssims) / batches)
            avg_lpipss.append(sum(epoch_lpipss) / batches)
            print(f"Epoch {epoch + 1}/{num_epoch}:")
            print(f"Discriminator loss: {losses_D[-1]:.4f}")
            print(f"Generator loss: {losses_G[-1]:.4f}")
            print(f"Epoch run time: {time.time() - start_time:.2f}s")

        if ckpt_dir and ckpt_every and (epoch + 1) % ckpt_every == 0:
            save_checkpoint(os.path.join(ckpt_dir, f"ckpt_epoch{epoch + 1}"), state)

    train_metrics = {
        "Average PSNR during training": avg_psnrs,
        "Average SSIM during training": avg_ssims,
        "Average LPIPS during training": avg_lpipss,
        # reference swaps these two log keys (train_GAN.py:132-133); fixed here
        "Final Generator loss": losses_G[-1] if losses_G else float("nan"),
        "Final Discriminator loss": losses_D[-1] if losses_D else float("nan"),
    }
    return state, train_metrics


def train_phase_ondevice(state, stacks, config: GANTrainConfig, lr, num_epoch,
                         train_log_freq, content_loss, lpips_fn,
                         ckpt_dir=None, ckpt_every=0, key=None, mesh=None):
    """GAN_ISR_train parity, executed as on-device epoch chunks.

    One dispatch per log-cadence chunk (metrics collected in the chunk's
    first epoch == the reference's epoch % log_freq == 0 logging points).
    """
    import jax.numpy as jnp

    from tpusr.engine.gan_epochs import gan_train_epochs

    print("Starting GAN training..")
    lr_u8, hr_u8, valid = stacks
    lr_u8 = jnp.asarray(lr_u8)
    hr_u8 = jnp.asarray(hr_u8)
    valid = jnp.asarray(valid)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        lr_u8 = jax.device_put(lr_u8, repl)
        hr_u8 = jax.device_put(hr_u8, repl)
        valid = jax.device_put(valid, repl)

    if key is None:
        key = jax.random.key(0)
    avg_psnrs, avg_ssims, avg_lpipss = [], [], []
    last_d = last_g = float("nan")

    # Cap single-dispatch size: a 10,000-step dispatch (800-image stack,
    # --train_log_freq 100) reproducibly crashed the TPU worker process
    # (docs/evidence_r5/prod_chunk_run*.log) while 1,000-step dispatches run
    # fine at the same stack and the amortization curve is flat past ~600
    # steps/dispatch (DESIGN.md round-4 knee; 13.4 ms/step steady at 800
    # images with 1,000-step dispatches = the bench-rate). A log-cadence
    # chunk therefore executes as ceil(chunk/max_ep) device dispatches;
    # metrics still come from the chunk's FIRST epoch (the reference's
    # epoch % log_freq == 0 logging point), so parity is unchanged.
    steps_per_epoch = max(1, lr_u8.shape[0] // config.batch_size)
    max_dispatch_steps = int(os.environ.get("TPUSR_MAX_DISPATCH_STEPS",
                                            "2000"))
    max_ep = max(1, max_dispatch_steps // steps_per_epoch)

    done = 0
    while done < num_epoch:
        chunk = min(train_log_freq, num_epoch - done)
        start_time = time.time()
        sub_done = 0
        chunk_logs = None
        while sub_done < chunk:
            sub = min(max_ep, chunk - sub_done)
            key, k = jax.random.split(key)
            state, logs = gan_train_epochs(
                state, lr_u8, hr_u8, valid, k, config, lr,
                content_loss=content_loss, n_epochs=sub, lpips_fn=lpips_fn,
                mesh=mesh)
            if chunk_logs is None:
                chunk_logs = logs  # metrics epoch = first epoch of the chunk
            sub_done += sub
        losses_D = np.asarray(chunk_logs["losses_D"])
        last_d = float(np.asarray(logs["losses_D"])[-1, -1])
        last_g = float(np.asarray(logs["losses_G"])[-1, -1])
        avg_psnrs.append(float(chunk_logs["psnr"]))
        avg_ssims.append(float(chunk_logs["ssim"]))
        avg_lpipss.append(float(chunk_logs["lpips"]))
        print(f"Epoch {done + 1}/{num_epoch}:")
        print(f"Discriminator loss: {losses_D[0, -1]:.4f}")
        print(f"Generator loss: {np.asarray(chunk_logs['losses_G'])[0, -1]:.4f}")
        print(f"Chunk of {chunk} epochs run time: {time.time() - start_time:.2f}s")
        done += chunk
        if ckpt_dir and ckpt_every and done % max(ckpt_every, 1) < chunk:
            save_checkpoint(os.path.join(ckpt_dir, f"ckpt_epoch{done}"), state)

    train_metrics = {
        "Average PSNR during training": avg_psnrs,
        "Average SSIM during training": avg_ssims,
        "Average LPIPS during training": avg_lpipss,
        "Final Generator loss": last_g,
        "Final Discriminator loss": last_d,
    }
    return state, train_metrics


def save_phase_models(state, prefix, out_dir, config):
    save_checkpoint(os.path.join(out_dir, f"{prefix}_state"), state)
    n_shuffles = {2: 1, 4: 2, 8: 3, 16: 4}[config.factor]
    sd = export_torch_generator(state.params_G, state.stats_G,
                                residual_blocks_count=config.residual_blocks_count,
                                n_shuffles=n_shuffles)
    save_torch_pth(sd, os.path.join(out_dir, f"{prefix}_srgan_G.pth"))
    # the reference persists the discriminator too (train_GAN.py:188)
    sd_d = export_torch_discriminator(state.params_D, state.stats_D,
                                      hr_patch=config.hr_patch)
    save_torch_pth(sd_d, os.path.join(out_dir, f"{prefix}_srgan_D.pth"))


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU-native SRGAN training")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--pre_train_epochs", type=int, default=8000)
    parser.add_argument("--fine_tune_epochs", type=int, default=4000)
    parser.add_argument("--pre_train_learning_rate", type=float, default=1e-4)
    parser.add_argument("--fine_tune_learning_rate", type=float, default=1e-5)
    parser.add_argument("--pre_trained_models_path", type=str)
    parser.add_argument("--train_log_freq", type=int, default=100)
    parser.add_argument("--num_images", type=int, default=-1)
    parser.add_argument("--downsample", type=str2bool, default=False)
    parser.add_argument("--legacy_detach", type=str2bool, default=False)
    parser.add_argument("--adv_weight", type=float, default=1.0,
                        help="G-loss adversarial coefficient; 1.0 = the "
                             "reference's unweighted sum (utils/GAN.py:121), "
                             "1e-3 = the SRGAN paper's value (extension)")
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="epochs between crash-resume checkpoints (0=off)")
    parser.add_argument("--resume", type=str,
                        help="orbax state checkpoint to resume from")
    parser.add_argument("--seed", type=int, default=0)
    # model/workload knobs (reference hardcodes: 192 patch train_GAN.py:270,
    # batch 8 :169, 16 residual blocks generator.py:45)
    parser.add_argument("--hr_patch_size", type=int, default=192)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--residual_blocks", type=int, default=16)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--d_moments", type=str, default=None,
                        choices=["bf16", "f32"],
                        help="storage dtype of the discriminator's Adam "
                             "moments (default bf16: +6% step throughput, "
                             "loss-neutral — PARITY.md; f32 restores "
                             "torch-exact optimizer state dtypes)")
    parser.add_argument("--d_params", type=str, default=None,
                        choices=["bf16", "f32"],
                        help="storage dtype of the discriminator's LARGE "
                             "weights (>=1M elems; update math stays f32). "
                             "The D step is weight-streaming bound — bf16 "
                             "halves the dense-head/Adam HBM streams "
                             "(default bf16: +8% step throughput, endpoint-"
                             "quality parity — PARITY.md; f32 restores "
                             "torch-exact weight dtypes)")
    parser.add_argument("--profile_dir", type=str)
    parser.add_argument("--data_parallel", type=str2bool, default=False,
                        help="shard the patch batch over all devices "
                             "(params replicated, XLA all-reduces grads)")
    parser.add_argument("--host_loop", type=str2bool, default=False,
                        help="use the per-step host loop (reference-style) "
                             "instead of the on-device epoch trainer")
    parser.add_argument("--legacy_scale", type=str2bool, default=False,
                        help="reproduce the reference's double-/255 image "
                             "scaling bug (dataset.py:151-157)")
    return parser


def run(argv=None):
    args = build_parser().parse_args(argv)
    require_dir(args.data_dir)
    require_dir(args.out_dir)
    check_num_images(args.num_images)

    LR_dir = os.path.join(args.data_dir, "DIV2K_train_LR_x8/")
    HR_dir = os.path.join(args.data_dir, "DIV2K_train_HR/")

    factor = 8  # train_GAN.py:242
    if args.downsample:
        factor *= 2

    out_dir = os.path.join(args.out_dir, f"trained/GANx{factor}/{timestamp()}")
    os.makedirs(out_dir, exist_ok=True)

    hr_patch = args.hr_patch_size  # default 192, train_GAN.py:270
    lr_patch = hr_patch // factor

    config = GANTrainConfig(
        factor=factor, batch_size=args.batch_size, hr_patch=hr_patch,
        residual_blocks_count=args.residual_blocks,
        pre_train_epochs=args.pre_train_epochs,
        fine_tune_epochs=args.fine_tune_epochs,
        pre_train_lr=args.pre_train_learning_rate,
        fine_tune_lr=args.fine_tune_learning_rate,
        legacy_detach=args.legacy_detach,
        legacy_scale=args.legacy_scale,
        adv_weight=args.adv_weight,
        dtype=None if args.dtype == "float32" else args.dtype,
        **({"d_moments": args.d_moments} if args.d_moments else {}),
        # bf16 weight storage requires f32 update math (= bf16 moments with
        # their f32 EMA), so an explicit --d_moments f32 without --d_params
        # drops the weight storage back to f32 too rather than asserting
        **({"d_params": args.d_params} if args.d_params
           else {"d_params": "f32"} if args.d_moments == "f32" else {}),
    )

    vgg = try_load_vgg19()
    content_loss = make_content_loss(vgg)
    print(f"Content loss: {'VGG19 phi_5,4' if vgg else 'pixel MSE (no VGG weights)'}")
    lpips_fn = make_lpips()

    dataset = GANDIV2KDataset(
        LR_dir=LR_dir, HR_dir=HR_dir, scale_factor=factor,
        num_images=args.num_images, LR_patch_size=(lr_patch, lr_patch),
        downsample=args.downsample, train=True, seed=args.seed,
        legacy_scale=args.legacy_scale)

    key = jax.random.key(args.seed)
    start_time = time.time()

    state = create_gan_state(key, config, config.pre_train_lr)
    if args.resume:
        state = load_checkpoint(args.resume, target=state)
        print(f"Resumed from {args.resume} at step {int(state.step)}")

    mesh = None
    if args.data_parallel:
        from tpusr.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if config.batch_size % n_dev != 0:
            print(f"--data_parallel requires batch_size ({config.batch_size}) "
                  f"divisible by device count ({n_dev})")
            sys.exit(1)
        mesh = make_mesh({"data": n_dev})
        print(f"Data-parallel over {n_dev} devices")

    skip_pretrain = args.pre_trained_models_path is not None
    if skip_pretrain:
        pre_state = load_checkpoint(
            os.path.join(args.pre_trained_models_path, "pre_trained_state"),
            target=state)
        # fresh Adam for fine-tune (train_GAN.py:35-36 fresh per phase)
        state = create_gan_state(
            key, config, config.fine_tune_lr,
            params_G=pre_state.params_G, stats_G=pre_state.stats_G,
            params_D=pre_state.params_D, stats_D=pre_state.stats_D)
    # on-device epoch trainer (default): whole log-chunks of epochs per
    # dispatch, patches cropped on chip (engine/gan_epochs.py); the cropper
    # takes legacy_scale as a static switch so parity runs keep the fast
    # path; --data_parallel combines with the on-device trainer via a GSPMD
    # sharding constraint on the patch batch
    on_device = not args.host_loop
    stacks = None
    if on_device:
        from tpusr.engine.gan_epochs import stack_dataset_for_device

        stacks = stack_dataset_for_device(dataset, config.batch_size)
        # the reference raises on images smaller than the patch
        # (np.random.randint low >= high, dataset.py:128); mirror it loudly
        # instead of silently cropping into padding
        too_small = (stacks[2] < lr_patch).any(axis=1)
        if too_small.any():
            print(f"{int(too_small.sum())} image(s) smaller than the "
                  f"{lr_patch}x{lr_patch} LR patch; reduce --hr_patch_size")
            sys.exit(1)

    phase_counter = [0]

    def run_phase(state, lr, epochs):
        phase_counter[0] += 1
        if on_device:
            # distinct crop streams per (seed, phase); the host-loop path
            # gets its per-epoch seeding from dataset.set_epoch instead
            phase_key = jax.random.fold_in(jax.random.key(args.seed),
                                           phase_counter[0])
            return train_phase_ondevice(
                state, stacks, config, lr, epochs, args.train_log_freq,
                content_loss, lpips_fn, out_dir, args.checkpoint_every,
                key=phase_key, mesh=mesh)
        step_fn = None
        if mesh is not None:
            from tpusr.parallel.gan_dp import make_dp_train_step

            place, step_fn = make_dp_train_step(mesh, config, lr, content_loss)
            state = place(state)
        return train_phase(
            state, dataset, config, lr, epochs, args.train_log_freq,
            content_loss, lpips_fn, out_dir, args.checkpoint_every,
            step_fn=step_fn)

    if skip_pretrain:
        pass
    else:
        print("Beginnning pre-training stage..")
        state, train_metrics = run_phase(state, config.pre_train_lr,
                                         config.pre_train_epochs)
        print("Done pre-training.")
        save_log(out_dir, **train_metrics)
        save_phase_models(state, "pre_trained", out_dir, config)
        # fresh optimizers for the fine-tune phase
        state = create_gan_state(
            key, config, config.fine_tune_lr,
            params_G=state.params_G, stats_G=state.stats_G,
            params_D=state.params_D, stats_D=state.stats_D)

    print("Beginning fine-tuning stage")
    state, train_metrics = run_phase(state, config.fine_tune_lr,
                                     config.fine_tune_epochs)
    print("Done fine-tuning stage.")

    runtime = time.time() - start_time
    train_metrics["Number of images used for training"] = args.num_images
    train_metrics["Train runtime"] = time.strftime("%H:%M:%S", time.gmtime(runtime))

    save_log(out_dir, **train_metrics)
    save_phase_models(state, "fine_tuned", out_dir, config)
    return out_dir


if __name__ == "__main__":
    run()
