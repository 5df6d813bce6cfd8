"""Pure-JAX image quality metrics (PSNR / SSIM / LPIPS hook).

The reference consumes torchmetrics implementations (DIP.py:7-8,157-159,
train_GAN.py:30-32, eval_GAN.py:30-32); these reproduce the same conventions
as pure, jittable, vmappable functions over NHWC arrays:

  * PSNR: data_range inferred from the target (max - min) when not given —
    torchmetrics' default behavior; squared error pooled over the whole batch.
  * SSIM: 11x11 gaussian kernel, sigma 1.5, k1=0.01, k2=0.03, valid
    convolution, mean over the SSIM map — torchmetrics defaults with
    data_range=1.0 as the entry scripts pass.

LPIPS requires learned AlexNet + linear-head weights; see tpusr/models/lpips.py.
The functions here are TPU-friendly: the gaussian window is applied as a
separable depthwise conv.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _valid_mask(shape_hw, valid_hw, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 1) mask of rows < valid_hw[0] and cols < valid_hw[1]."""
    h, w = shape_hw
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < valid_hw[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < valid_hw[1]
    return (rows & cols).astype(dtype)[..., None]


def psnr_masked(pred, target, valid_hw, data_range: float | None = None) -> jnp.ndarray:
    """PSNR over the valid top-left region of padded NHWC images.

    Used by the shape-bucketed DIP path: shapes are static (bucketed), the
    valid extent is a traced value, so one compile serves every image in the
    bucket. data_range=None infers max-min over the VALID region of the
    target, matching torchmetrics' default (and the non-bucketed psnr).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    m = _valid_mask(pred.shape[1:3], valid_hw)
    if data_range is None:
        tmax = jnp.max(jnp.where(m > 0, target, -jnp.inf))
        tmin = jnp.min(jnp.where(m > 0, target, jnp.inf))
        dr = tmax - tmin
    else:
        dr = jnp.asarray(data_range, jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0) * pred.shape[0] * pred.shape[-1]
    mse = jnp.sum(((pred - target) ** 2) * m) / n
    return 10.0 * jnp.log10(dr * dr / mse)


def ssim_masked(pred, target, valid_hw, data_range: float = 1.0,
                kernel_size: int = 11, sigma: float = 1.5,
                k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """SSIM averaged over the valid part of the (valid-conv) SSIM map."""
    ssim_map = _ssim_map(pred, target, data_range, kernel_size, sigma, k1, k2)
    crop = kernel_size - 1
    m = _valid_mask(ssim_map.shape[1:3], valid_hw - crop)
    n = jnp.maximum(jnp.sum(m), 1.0) * ssim_map.shape[0] * ssim_map.shape[-1]
    return jnp.sum(ssim_map * m) / n


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float | None = None) -> jnp.ndarray:
    """Peak signal-to-noise ratio, pooled over all elements."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if data_range is None:
        dr = jnp.max(target) - jnp.min(target)
    else:
        dr = jnp.asarray(data_range, jnp.float32)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(dr * dr / mse)


def _gaussian_window(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) / 2.0
    x = np.arange(kernel_size, dtype=np.float64) - half
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian filter over NHWC."""
    c = x.shape[-1]
    k = win.shape[0]
    wh = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c)).astype(x.dtype)
    ww = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c)).astype(x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, wh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    return lax.conv_general_dilated(y, ww, (1, 1), "VALID",
                                    dimension_numbers=dn, feature_group_count=c)


def _ssim_map(pred, target, data_range, kernel_size, sigma, k1, k2):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    win = jnp.asarray(_gaussian_window(kernel_size, sigma))

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _depthwise_blur(pred, win)
    mu_t = _depthwise_blur(target, win)
    mu_pp = _depthwise_blur(pred * pred, win)
    mu_tt = _depthwise_blur(target * target, win)
    mu_pt = _depthwise_blur(pred * target, win)

    # float cancellation can push E[x^2]-E[x]^2 slightly negative on flat
    # regions, collapsing the denominator (observed: SSIM -81 mid-DIP-run);
    # true variances are nonnegative, so clamp
    var_p = jnp.maximum(mu_pp - mu_p * mu_p, 0.0)
    var_t = jnp.maximum(mu_tt - mu_t * mu_t, 0.0)
    cov = mu_pt - mu_p * mu_t

    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    return num / den


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity, mean over the valid SSIM map, batch and channels."""
    return jnp.mean(_ssim_map(pred, target, data_range, kernel_size, sigma, k1, k2))
