"""SRGAN generator & discriminator, NHWC / flax.

Capability parity with the reference topology:
  Generator      models/GAN/generator.py:44-81
  Discriminator  models/GAN/discriminator.py:21-74

TPU-first differences (behavior-preserving):
  * NHWC layout; pixel-shuffle is a reshape/transpose keeping torch's channel
    ordering so .pth weights import 1:1.
  * The discriminator returns LOGITS; callers apply sigmoid where they need a
    probability. The reference bakes Sigmoid into the module (:45,:72) and
    then feeds probabilities to BCELoss — mathematically identical, but the
    logits form lets the loss use the numerically stable log-sigmoid fusion.
  * The FC input width falls out of static shape inference at flax init —
    the JAX answer to the reference's dummy ones-forward sizing trick
    (discriminator.py:48-56).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from tpusr.models.layers import BatchNorm, Conv, Dense, PReLU, leaky_relu, pixel_shuffle


class ResidualBlock(nn.Module):
    """conv k3 -> BN -> PReLU -> conv k3 -> BN -> +x (generator.py:4-25)."""

    dtype: Any = None
    auto_fuse: bool = False
    fusion: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = True):
        ura = not train
        z = Conv(64, 3, dtype=self.dtype, auto_fuse=self.auto_fuse,
                 fusion=self.fusion, name="conv1")(x)
        z = BatchNorm(name="bn1")(z, ura)
        z = PReLU(name="prelu1")(z)
        z = Conv(64, 3, dtype=self.dtype, auto_fuse=self.auto_fuse,
                 fusion=self.fusion, name="conv2")(z)
        z = BatchNorm(name="bn2")(z, ura)
        return x + z


class PixelShuffleBlock(nn.Module):
    """conv 64->256 k3 -> PixelShuffle(2) -> PReLU (generator.py:27-41)."""

    dtype: Any = None
    auto_fuse: bool = False
    fusion: str = "auto"

    @nn.compact
    def __call__(self, x):
        x = Conv(256, 3, dtype=self.dtype, auto_fuse=self.auto_fuse,
                 fusion=self.fusion, name="conv1")(x)
        x = pixel_shuffle(x, 2)
        return PReLU(name="prelu1")(x)


class Generator(nn.Module):
    """SRGAN generator; output in [-1, 1] (tanh head, generator.py:62-64).

    factor 8 -> 3 shuffle blocks, factor 16 -> 4 (generator.py:55-58); any
    power of two is accepted here (the x4 benchmark config uses 2 blocks).
    ``dtype='bfloat16'`` computes activations in bf16 (params stay f32);
    the output is always f32.
    """

    factor: int = 8
    residual_blocks_count: int = 16
    dtype: Any = None
    # Route the 3x3 convs through the fused Pallas kernel when the shape
    # qualifies (batch-1 full-image eval; training batches fall through the
    # n==1 gate automatically). Default off for training; the eval entry
    # point opts in (engine/gan.py generator_forward — measured +19% on the
    # x8 eval bench). Routing is carried in GANTrainConfig.g_fuse, never
    # read from env at trace time.
    auto_fuse: bool = False
    fusion: str = "auto"  # 'auto' | 'off' | 'interpret' (layers.fusion_mode)

    @nn.compact
    def __call__(self, x, train: bool = True):
        ura = not train
        n_shuffles = {2: 1, 4: 2, 8: 3, 16: 4}[self.factor]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        z = Conv(64, 9, dtype=self.dtype, name="conv1")(x)
        x0 = PReLU(name="prelu1")(z)

        z = x0
        for i in range(self.residual_blocks_count):
            z = ResidualBlock(dtype=self.dtype, auto_fuse=self.auto_fuse,
                              fusion=self.fusion, name=f"res{i}")(z, train)

        z = Conv(64, 3, dtype=self.dtype, auto_fuse=self.auto_fuse,
                 fusion=self.fusion, name="conv2")(z)
        z = BatchNorm(name="bn1")(z, ura)
        z = x0 + z  # long skip (generator.py:74)

        for i in range(n_shuffles):
            z = PixelShuffleBlock(dtype=self.dtype,
                                  auto_fuse=self.auto_fuse,
                                  fusion=self.fusion,
                                  name=f"ps{i}")(z)

        z = Conv(3, 9, dtype=self.dtype, name="conv3")(z)
        return jnp.tanh(z.astype(jnp.float32))


class Discriminator(nn.Module):
    """SRGAN discriminator over NHWC patches; returns logits (float32).

    Channel/stride schedule 64(s2),128(s1),128(s2),256(s1),256(s2),512(s1),
    512(s2) after the stem (discriminator.py:29-35).
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, stat_groups: int = 1):
        # stat_groups=g: x stacks g independent batches along N; every BN
        # computes per-group statistics (layers.BatchNorm stat_groups), so
        # one application over concat(real, fake) is exactly the reference's
        # two sequential calls (train_GAN.py:44-48) while the convs and the
        # dense head stream their weights once instead of twice.
        ura = not train
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = Conv(64, 3, dtype=self.dtype, name="conv")(x)
        x = leaky_relu(x, 0.2)
        schedule = [(64, 2), (128, 1), (128, 2), (256, 1), (256, 2), (512, 1), (512, 2)]
        for i, (ch, st) in enumerate(schedule):
            x = Conv(ch, 3, stride=st, dtype=self.dtype, name=f"block{i}_conv")(x)
            x = BatchNorm(name=f"block{i}_bn")(x, ura, stat_groups=stat_groups)
            x = leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = Dense(1024, dtype=self.dtype, name="dense1")(x)
        x = leaky_relu(x, 0.2)
        logits = Dense(1, dtype=self.dtype, name="dense2")(x)
        return logits.astype(jnp.float32)


def discriminator_prob(logits: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid head of the reference discriminator (discriminator.py:72)."""
    return nn.sigmoid(logits)
