"""RRDB (ESRGAN-scale) generator — BASELINE.json config 5.

The reference repo ships only the SRGAN topology; the benchmark config list
("ESRGAN-scale RRDB generator x4 producing 2K outputs on a v5p slice")
calls for the larger residual-in-residual dense-block generator of ESRGAN
(Wang et al. 2018). Standard topology, NHWC/TPU-first:

  conv_first -> nb x RRDB (3 dense blocks each: 5 convs, growth gc,
  residual scaling 0.2) -> trunk conv + long skip -> [nearest x2 + conv +
  lrelu] per octave -> conv_hr -> conv_last

At the canonical nf=64, nb=23, gc=32, x4 size this is 16,697,987 params.
Full-resolution 2K outputs ride the spatial tiling / halo-sharding paths in
tpusr/parallel/spatial.py (the model is fully convolutional).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from tpusr.models.layers import Conv, leaky_relu


class DenseBlock(nn.Module):
    """5-conv dense block with growth gc and 0.2 residual scaling."""

    nf: int = 64
    gc: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        c1 = leaky_relu(Conv(self.gc, 3, dtype=dt, name="conv1")(x), 0.2)
        c2 = leaky_relu(Conv(self.gc, 3, dtype=dt, name="conv2")(
            jnp.concatenate([x, c1], -1)), 0.2)
        c3 = leaky_relu(Conv(self.gc, 3, dtype=dt, name="conv3")(
            jnp.concatenate([x, c1, c2], -1)), 0.2)
        c4 = leaky_relu(Conv(self.gc, 3, dtype=dt, name="conv4")(
            jnp.concatenate([x, c1, c2, c3], -1)), 0.2)
        c5 = Conv(self.nf, 3, dtype=dt, name="conv5")(
            jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = DenseBlock(self.nf, self.gc, self.dtype, name="rdb1")(x)
        out = DenseBlock(self.nf, self.gc, self.dtype, name="rdb2")(out)
        out = DenseBlock(self.nf, self.gc, self.dtype, name="rdb3")(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    """ESRGAN generator. Output is unbounded (no tanh), input [0,1].

    ``dtype='bfloat16'`` computes activations in bf16 (params f32, output f32).
    """

    out_channels: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4  # power of two
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        assert self.scale & (self.scale - 1) == 0, "scale must be power of 2"
        if self.dtype is not None:
            x = x.astype(self.dtype)
        fea = Conv(self.nf, 3, dtype=self.dtype, name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, self.dtype, name=f"rrdb{i}")(trunk)
        trunk = Conv(self.nf, 3, dtype=self.dtype, name="trunk_conv")(trunk)
        fea = fea + trunk

        n_up = self.scale.bit_length() - 1
        for i in range(n_up):
            fea = jnp.repeat(jnp.repeat(fea, 2, axis=1), 2, axis=2)
            fea = leaky_relu(
                Conv(self.nf, 3, dtype=self.dtype, name=f"upconv{i + 1}")(fea), 0.2)
        fea = leaky_relu(Conv(self.nf, 3, dtype=self.dtype, name="conv_hr")(fea), 0.2)
        out = Conv(self.out_channels, 3, dtype=self.dtype, name="conv_last")(fea)
        return out.astype(jnp.float32)
