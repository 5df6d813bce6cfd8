"""Pallas TPU kernel: fused image degradation (on-chip PRNG + noise + clip).

The XLA path (tpusr/ops/degrade.py) draws a full noise tensor with
jax.random, writes it to HBM, then reads it back to add — two extra HBM
round-trips for a bandwidth-bound op. This kernel generates the random bits
in VMEM with the TPU's native PRNG (pltpu.prng_random_bits), converts them to
Gaussian (Box–Muller) or threshold masks in-register, and applies the
degradation in a single fused pass over row tiles.

Semantics match tpusr.ops.degrade (uint8-domain float32 images):
  gaussian:     clip(img + N(0, std*255), 0, 255) floored
  salt&pepper:  per-(h,w) masks shared across channels, salt then pepper

Tests run the kernel in interpreter mode on CPU (tests/test_pallas.py);
the distributions differ from jax.random only in the underlying bit stream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 256  # rows per grid step; W*C lanes stream through the VPU


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 uniform in (0, 1): set exponent to [1,2), subtract 1."""
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one = jnp.uint32(0x3F800000)
    f = pltpu.bitcast(mantissa | one, jnp.float32)
    return f - 1.0


def _gauss_kernel(seed_ref, img_ref, out_ref, *, std255: float):
    # img/out blocks are 2-D (rows, W*C): C=3 in the lane dimension would pad
    # 3 -> 128 lanes and blow VMEM; flattened W*C packs lanes densely.
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = img_ref.shape
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    # Box–Muller; clamp u1 away from 0 so log is finite
    u1 = jnp.maximum(u1, 1e-7)
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    out = jnp.clip(img_ref[:] + z * std255, 0.0, 255.0)
    out_ref[:] = jnp.floor(out)


def _saltpepper_kernel(seed_ref, img_ref, out_ref, *, s: float, p: float):
    # Planar layout: block is (1, rows, W) of one channel. The PRNG is
    # seeded by the ROW-TILE index only (grid dim 1), so every channel
    # program of the same tile draws identical bits -> channel-shared masks
    # without any cross-lane interleaving.
    pltpu.prng_seed(seed_ref[0], pl.program_id(1))
    shape = img_ref.shape
    us = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    up = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    out = jnp.where(us < s, 255.0, img_ref[:])
    out = jnp.where(up < p, 0.0, out)
    out_ref[:] = out


def _run(kernel, image: jnp.ndarray, seed, interpret: bool) -> jnp.ndarray:
    h, w, c = image.shape
    tile = min(_TILE_H, h)
    grid = pl.cdiv(h, tile)
    seed_arr = jnp.asarray([seed], jnp.int32)
    flat = image.astype(jnp.float32).reshape(h, w * c)
    # The plain HLO interpreter lacks the TPU PRNG primitives; use the
    # TPU-semantics interpreter for CPU debugging of non-PRNG logic.
    interp = pltpu.InterpretParams() if interpret else False
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, w * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w * c), jnp.float32),
        interpret=interp,
    )(seed_arr, flat)
    return out.reshape(h, w, c)


@partial(jax.jit, static_argnames=("std", "interpret"))
def pallas_add_gaussian_noise(image: jnp.ndarray, seed: jnp.ndarray,
                              std: float = 1.0, interpret: bool = False):
    """Fused gaussian degradation of an HWC uint8-domain image."""
    return _run(partial(_gauss_kernel, std255=std * 255.0), image, seed, interpret)


@partial(jax.jit, static_argnames=("s", "p", "interpret"))
def pallas_add_salt_pepper_noise(image: jnp.ndarray, seed: jnp.ndarray,
                                 s: float = 0.01, p: float = 0.01,
                                 interpret: bool = False):
    """Fused salt&pepper degradation (channel-shared masks)."""
    h, w, c = image.shape
    tile = min(_TILE_H, h)
    grid = (c, pl.cdiv(h, tile))
    seed_arr = jnp.asarray([seed], jnp.int32)
    planar = image.astype(jnp.float32).transpose(2, 0, 1)  # (C, H, W)
    interp = pltpu.InterpretParams() if interpret else False
    out = pl.pallas_call(
        partial(_saltpepper_kernel, s=s, p=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, w), lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, w), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interp,
    )(seed_arr, planar)
    return out.transpose(1, 2, 0)
