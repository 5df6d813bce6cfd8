"""On-device, PRNG-keyed image degradation ops.

Capability parity with ``utils/degradation.py`` (reference :5-20), redesigned
for TPU:

  * All randomness is explicit (jax.random keys) instead of global NumPy
    state — reproducible, vmappable, shardable.
  * Ops run on device over batched NHWC arrays, so the degradation chain can
    be fused by XLA into the training input pipeline (the reference runs it
    per-sample on the host inside ``__getitem__``).
  * ``degrade_pipeline`` is the fused bicubic-downsample → noise chain used
    by the batched-DIP path (BASELINE config 4).

Value convention: these ops work in the uint8 domain represented as float32
in [0, 255], mirroring the reference (which degrades uint8 arrays before
ToTensor's /255).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusr.ops.bicubic import resize_bicubic


def add_gaussian_noise(key: jax.Array, image: jnp.ndarray, std: float = 1.0) -> jnp.ndarray:
    """clip(img + N(0, std*255), 0, 255), truncated to integer values.

    Parity: utils/degradation.py:5-7 (including the trailing ``astype(uint8)``
    truncation — values are floored, not rounded).
    """
    noise = jax.random.normal(key, image.shape, dtype=jnp.float32) * (std * 255.0)
    out = jnp.clip(image.astype(jnp.float32) + noise, 0.0, 255.0)
    return jnp.floor(out)


def add_salt_pepper_noise(
    key: jax.Array, image: jnp.ndarray, s: float = 0.01, p: float = 0.01
) -> jnp.ndarray:
    """Per-pixel (shared across channels) salt=255 then pepper=0 masks.

    Parity: utils/degradation.py:9-17 — pepper is applied after salt, so a
    pixel drawn for both ends up pepper.
    """
    *lead, h, w, c = image.shape
    ks, kp = jax.random.split(key)
    salt = jax.random.uniform(ks, (*lead, h, w, 1)) < s
    pepper = jax.random.uniform(kp, (*lead, h, w, 1)) < p
    out = jnp.where(salt, 255.0, image.astype(jnp.float32))
    out = jnp.where(pepper, 0.0, out)
    return out


def degrade_pipeline(
    key: jax.Array,
    hr_u8: jnp.ndarray,
    factor: int,
    noise_type: dict | None = None,
) -> jnp.ndarray:
    """Fused on-device HR -> degraded LR chain (uint8-domain float in/out).

    bicubic /factor downsample, then optional Gaussian or salt-and-pepper
    noise — the on-device equivalent of the reference's host-side
    ``get_image_pair`` degradation steps (dataset.py:21-27, 52-56).
    """
    h, w = hr_u8.shape[-3], hr_u8.shape[-2]
    lr = resize_bicubic(hr_u8.astype(jnp.float32), h // factor, w // factor)
    lr = jnp.clip(jnp.round(lr), 0.0, 255.0)
    if noise_type is None:
        return lr
    if noise_type["type"] == "Gaussian":
        return add_gaussian_noise(key, lr, std=noise_type["std"])
    if noise_type["type"] == "SaltAndPepper":
        return add_salt_pepper_noise(key, lr, s=noise_type["s"], p=noise_type["p"])
    raise ValueError(f"unknown noise type {noise_type!r}")
