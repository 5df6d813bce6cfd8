"""On-device multi-epoch SRGAN trainer — the whole training loop on chip.

The reference crops patches per sample on the host and dispatches one
framework call per optimizer step (train_GAN.py:38-71, dataset.py:121-147).
tpusr's per-step jit already fuses a step; this module goes further and
keeps ENTIRE EPOCHS on device:

  * the (uint8) decoded images are uploaded once and stay in HBM;
  * aligned random patch cropping (dataset.py:121-147 semantics: LR center
    uniform over the valid range, HR window = LR window x factor) runs
    on-device with explicit PRNG keys, vmapped over the batch;
  * `lax.scan` over steps x epochs executes a whole metric-cadence chunk in
    one dispatch.

Measured motivation (DESIGN.md): a dispatched train step costs 8-18 s over
the tunneled TPU while the same step inside a scan costs 24 ms — and even on
directly-attached chips, per-step host dispatch + patch upload is the
classic input-pipeline bottleneck the reference suffers from (SURVEY §3.2
"the input pipeline IS the bottleneck").

Batch semantics: images are visited in fixed order in batches of
``config.batch_size`` (reference DataLoader shuffle=False, train_GAN.py:175).
The image stack must be a multiple of the batch size — callers pad by
wrapping (divergence only when N % B != 0; the reference's DIV2K default
N=800, B=8 divides evenly).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from tpusr.engine import losses as L
from tpusr.engine.gan import GANTrainConfig, GANTrainState, _train_step_core
from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.engine.metrics import ssim as ssim_fn


def _crop_pair(lr_img_u8, hr_img_u8, valid_lr, key, lr_patch: int, factor: int,
               legacy_scale: bool = False):
    """One aligned random patch pair from padded uint8 images.

    Offsets follow dataset.py:128-141: LR top-left uniform in
    [0, valid - patch) — the reference's randint(p//2, v - p//2) center.
    """
    kx, ky = jax.random.split(key)
    max_left = valid_lr[1] - lr_patch
    max_top = valid_lr[0] - lr_patch
    left = jax.random.randint(kx, (), 0, jnp.maximum(max_left, 1))
    top = jax.random.randint(ky, (), 0, jnp.maximum(max_top, 1))

    lr_p = jax.lax.dynamic_slice(lr_img_u8, (top, left, 0),
                                 (lr_patch, lr_patch, 3))
    hr_p = jax.lax.dynamic_slice(hr_img_u8, (top * factor, left * factor, 0),
                                 (lr_patch * factor, lr_patch * factor, 3))
    # GANDIV2KDataset.scale_images (dataset.py:149-159); legacy_scale
    # reproduces the reference's second /255 on the already-[0,1] tensors
    # (dataset.py:151-157 bug) without leaving the on-device trainer
    lr_f = lr_p.astype(jnp.float32) / 255.0
    hr_f = hr_p.astype(jnp.float32) / 255.0
    if legacy_scale:
        lr_f = lr_f / 255.0
        hr_f = hr_f / 255.0
    return lr_f, hr_f * 2.0 - 1.0


@partial(jax.jit, static_argnames=("config", "learning_rate", "content_loss",
                                   "n_epochs", "lpips_fn", "mesh"))
def gan_train_epochs(
    state: GANTrainState,
    lr_images_u8: jnp.ndarray,   # (N, lh, lw, 3) uint8, padded
    hr_images_u8: jnp.ndarray,   # (N, lh*f, lw*f, 3) uint8, padded
    valid_lr: jnp.ndarray,       # (N, 2) int32 true LR dims
    key: jax.Array,
    config: GANTrainConfig,
    learning_rate: float,
    content_loss: Callable = L.mse,
    n_epochs: int = 1,
    lpips_fn: Callable | None = None,
    mesh=None,
):
    """Run ``n_epochs`` epochs fully on device.

    Metrics (PSNR/SSIM/LPIPS of the generator on its own training patches,
    GAN_ISR_train parity train_GAN.py:102-120) are collected during the
    FIRST epoch of the chunk — callers align chunks to the log cadence so
    that epoch is the reference's ``epoch % log_freq == 0``.

    Returns (state, logs) with logs:
      losses_D/losses_G: (n_epochs, steps)
      psnr/ssim/lpips: scalars from the metrics epoch
    """
    n = lr_images_u8.shape[0]
    b = config.batch_size
    assert n % b == 0, "image stack must be a multiple of the batch size"
    steps = n // b
    f = config.factor
    lr_patch = config.hr_patch // f

    crop_batch = jax.vmap(
        partial(_crop_pair, lr_patch=lr_patch, factor=f,
                legacy_scale=config.legacy_scale))

    if mesh is not None:
        # Data-parallel epochs: image stacks + state stay replicated, the
        # cropped patch batch is constrained onto the 'data' axis — GSPMD
        # shards the D/G compute and all-reduces the gradients (classic DP,
        # shared conv weights). BN moments become global-batch (better than
        # torch-DDP-without-SyncBN; DESIGN.md).
        from jax.sharding import NamedSharding, PartitionSpec as P

        patch_sharding = NamedSharding(mesh, P("data"))
    else:
        patch_sharding = None

    def make_step(with_metrics: bool):
        def step(state, args):
            s_idx, k = args
            lr_b = jax.lax.dynamic_slice_in_dim(lr_images_u8, s_idx * b, b)
            hr_b = jax.lax.dynamic_slice_in_dim(hr_images_u8, s_idx * b, b)
            v_b = jax.lax.dynamic_slice_in_dim(valid_lr, s_idx * b, b)
            lr_p, hr_p = crop_batch(lr_b, hr_b, v_b, jax.random.split(k, b))
            if patch_sharding is not None:
                lr_p = jax.lax.with_sharding_constraint(lr_p, patch_sharding)
                hr_p = jax.lax.with_sharding_constraint(hr_p, patch_sharding)
            state, losses = _train_step_core(state, lr_p, hr_p, config,
                                             learning_rate, content_loss)
            if not with_metrics:
                return state, (losses["loss_D"], losses["loss_G"])
            from tpusr.engine.gan import generator_forward

            out = generator_forward(state.params_G, state.stats_G, lr_p,
                                    config, train=True)
            m_psnr = psnr_fn(out, hr_p)
            m_ssim = ssim_fn(out, hr_p, data_range=1.0)
            m_lpips = (lpips_fn(out, hr_p) if lpips_fn is not None
                       else jnp.asarray(jnp.nan, jnp.float32))
            return state, (losses["loss_D"], losses["loss_G"],
                           m_psnr, m_ssim, m_lpips)
        return step

    step_ids = jnp.arange(steps)

    def epoch_plain(state, k_epoch):
        keys = jax.random.split(k_epoch, steps)
        state, (ld, lg) = jax.lax.scan(make_step(False), state,
                                       (step_ids, keys))
        return state, (ld, lg)

    k0, k_rest = jax.random.split(key)
    keys0 = jax.random.split(k0, steps)
    state, (ld0, lg0, psnrs, ssims, lpipss) = jax.lax.scan(
        make_step(True), state, (step_ids, keys0))

    if n_epochs > 1:
        epoch_keys = jax.random.split(k_rest, n_epochs - 1)
        state, (ld_r, lg_r) = jax.lax.scan(epoch_plain, state, epoch_keys)
        losses_D = jnp.concatenate([ld0[None], ld_r], axis=0)
        losses_G = jnp.concatenate([lg0[None], lg_r], axis=0)
    else:
        losses_D, losses_G = ld0[None], lg0[None]

    logs = {
        "losses_D": losses_D,
        "losses_G": losses_G,
        "psnr": jnp.mean(psnrs),
        "ssim": jnp.mean(ssims),
        "lpips": jnp.mean(lpipss),
    }
    return state, logs


def stack_dataset_for_device(dataset, batch_size: int):
    """Host side: decode the whole (float [0,1]) dataset once and pack it
    into padded uint8 stacks + valid-dims for gan_train_epochs.

    Returns (lr_u8 (N,lh,lw,3), hr_u8, valid_lr (N,2)) with N padded to a
    multiple of batch_size by wrapping.
    """
    import numpy as np

    items = [dataset.base_pair(i) if hasattr(dataset, "base_pair") else dataset[i]
             for i in range(len(dataset))]
    # items are (lr [0,1] float, hr float, name); GAN datasets in train mode
    # crop — callers must pass a non-train dataset or use base_pair.
    f = items[0][1].shape[0] // items[0][0].shape[0]
    lh = max(it[0].shape[0] for it in items)
    lw = max(it[0].shape[1] for it in items)

    n = len(items)
    total = n + (-n) % batch_size  # wrap-pad to a batch multiple
    # preallocated padded stacks + in-place quantize: the per-image
    # round/astype/pad/stack chain measured 0.57 s/image at DIV2K dims on
    # this host (tools/host_pipeline.py) — one shared f32 scratch and a
    # direct write into the slot cuts the copies to one per image
    lr_out = np.zeros((total, lh, lw, 3), np.uint8)
    hr_out = np.zeros((total, lh * f, lw * f, 3), np.uint8)
    valid = np.zeros((total, 2), np.int32)
    scratch = np.empty(lh * f * lw * f * 3, np.float32)  # flat, sliced per image

    def quantize_into(dst, img):
        if img.dtype == np.uint8:
            dst[: img.shape[0], : img.shape[1]] = img
            return
        s = scratch[: img.size].reshape(img.shape)
        np.multiply(img, 255.0, out=s)
        np.rint(s, out=s)
        dst[: img.shape[0], : img.shape[1]] = s  # astype on assignment

    for j in range(total):
        lr_img, hr_img, _ = items[j if j < n else j - n]
        quantize_into(lr_out[j], lr_img)
        quantize_into(hr_out[j], hr_img)
        valid[j] = (lr_img.shape[0], lr_img.shape[1])

    return lr_out, hr_out, valid
