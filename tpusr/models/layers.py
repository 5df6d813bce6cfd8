"""Model building blocks with PyTorch-matching semantics, NHWC/TPU layout.

These exist so that (a) the DIP skip net and SRGAN reproduce the reference
architectures' math exactly (BatchNorm statistics, PReLU sharing, init
distributions), and (b) checkpoints exported from the torch world can be
imported weight-for-weight (io/checkpoint.py).

Init parity: torch Conv2d/Linear default to kaiming_uniform(a=sqrt(5)) which
reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both kernel and bias. DIP
re-initializes a fresh random net per image (DIP.py:169-174), so matching the
init *distribution* is part of behavioral parity, not a nicety.

BatchNorm parity: torch BatchNorm2d (eps=1e-5, momentum=0.1) normalizes with
the biased batch variance in train mode but stores the *unbiased* variance in
its running stats; flax.linen.BatchNorm stores the biased one, so we roll our
own. The DIP skip net always runs in train mode with batch=1 (DIP.py never
calls .eval()), so its BN is effectively instance normalization — that falls
out of this module naturally.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for HWIO conv / (in, out) dense."""
    if len(shape) == 4:  # HWIO
        fan_in = shape[0] * shape[1] * shape[2]
    else:  # dense (in, out)
        fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class Conv(nn.Module):
    """2-D conv over NHWC with torch-style 'same' padding semantics.

    pad_mode: 'zero' pads inside the conv; 'reflection' applies reflect
    padding first then a VALID conv (parity: models/DIP/utils.py:96-102).
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    pad_mode: str = "zero"  # 'zero' | 'reflection' | 'valid'
    dtype: Any = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = (k - 1) // 2
        if self.pad_mode == "reflection" and p > 0:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
            padding = "VALID"
        elif self.pad_mode == "valid" or p == 0:
            padding = "VALID"
        else:
            padding = ((p, p), (p, p))
        fan_in = k * k * x.shape[-1]
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
        )(x)


class Dense(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            features=self.features,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(x.shape[-1]),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics over NHWC.

    * train mode: normalize with batch mean / biased batch var (over N,H,W),
      update running stats with momentum 0.1 and the UNBIASED variance.
    * eval mode: normalize with running stats.
    Running stats live in the 'batch_stats' collection.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s), (c,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))

        in_dtype = x.dtype
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Stats accumulate in f32 WITHOUT materializing an f32 copy of
            # the tensor (a full-size cast costs 2 extra HBM passes per BN
            # on the bf16 path). E[x^2]-E[x]^2 with bf16 squares can go
            # slightly negative on near-constant channels — clamp.
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(x), axis=axes, dtype=jnp.float32)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            n = x.size // c
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        # fold scale/offset into one fused multiply-add in the input dtype
        inv = jax.lax.rsqrt(var + self.eps)
        eff_scale = (inv * scale).astype(in_dtype)
        eff_bias = (bias - mean * inv * scale).astype(in_dtype)
        return x * eff_scale + eff_bias


class PReLU(nn.Module):
    """torch nn.PReLU(): one shared learnable slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k, s: jnp.full(s, 0.25), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle over NHWC: channel c*r*r+dy*r+dx -> (c, y+dy, x+dx).

    Keeping torch's channel-block ordering makes .pth generator weights
    import-compatible (parity: models/GAN/generator.py:32).
    """
    n, h, w, c = x.shape
    cout = c // (r * r)
    x = x.reshape(n, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, cout
    return x.reshape(n, h * r, w * r, cout)


def pool2x2(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """torch AvgPool2d(2,2) / MaxPool2d(2,2) parity over NHWC."""
    if mode == "avg":
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return s / 4.0
    if mode == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    raise ValueError(f"unknown pool mode {mode!r}")


def _linear2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x linear upsample along one axis, half-pixel centers, edge clamp.

    Closed form for scale 2 / align_corners=False: the two output samples
    around input i are 0.25*x[i-1]+0.75*x[i] and 0.75*x[i]+0.25*x[i+1].
    Pure shifts + fma + interleave — no gathers, so XLA keeps it on the VPU
    (jax.image.resize lowers to gathers that crawl on TPU).
    """
    n = x.shape[axis]
    lo = jnp.concatenate([lax.slice_in_dim(x, 0, 1, axis=axis),
                          lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    hi = jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis),
                          lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis)
    even = 0.25 * lo + 0.75 * x
    odd = 0.75 * x + 0.25 * hi
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def upsample2x(x: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=2) parity (align_corners=False)."""
    if mode == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    if mode == "bilinear":
        return _linear2x_axis(_linear2x_axis(x, 1), 2)
    raise ValueError(f"unknown upsample mode {mode!r}")


def concat_center_crop(xs: Sequence[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Concat after center-cropping all inputs to the min spatial size.

    Parity: the Concat module of the reference (models/DIP/utils.py:10-41).
    Crop offsets are static (shapes known at trace time) — no dynamic shapes
    reach XLA.
    """
    hs = [x.shape[1] for x in xs]
    ws = [x.shape[2] for x in xs]
    th, tw = min(hs), min(ws)
    cropped = []
    for x in xs:
        dh = (x.shape[1] - th) // 2
        dw = (x.shape[2] - tw) // 2
        cropped.append(x[:, dh:dh + th, dw:dw + tw, :])
    return jnp.concatenate(cropped, axis=axis)


def activation(name: str) -> Callable:
    """'LeakyReLU' | 'ELU' | 'none' (parity: models/DIP/utils.py:62-76)."""
    if name == "LeakyReLU":
        return lambda x: leaky_relu(x, 0.2)
    if name == "ELU":
        return jax.nn.elu
    if name == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")
