"""Tests for keyed on-device degradation ops (parity: utils/degradation.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.ops.degrade import (
    add_gaussian_noise,
    add_salt_pepper_noise,
    degrade_pipeline,
)


def test_gaussian_noise_stats_and_range():
    key = jax.random.key(0)
    img = jnp.full((64, 64, 3), 128.0)
    out = add_gaussian_noise(key, img, std=0.1)
    a = np.asarray(out)
    assert a.min() >= 0 and a.max() <= 255
    assert np.all(a == np.floor(a))  # truncation parity with astype(uint8)
    # std ~ 25.5 around 128
    assert 20 < a.std() < 32
    assert abs(a.mean() - 128) < 3


def test_gaussian_noise_deterministic_per_key():
    img = jnp.full((8, 8, 3), 100.0)
    k = jax.random.key(42)
    np.testing.assert_array_equal(
        np.asarray(add_gaussian_noise(k, img, 0.2)),
        np.asarray(add_gaussian_noise(k, img, 0.2)),
    )


def test_salt_pepper_masks_shared_across_channels():
    key = jax.random.key(1)
    img = jnp.full((128, 128, 3), 128.0)
    out = np.asarray(add_salt_pepper_noise(key, img, s=0.05, p=0.05))
    is_salt = out == 255
    is_pepper = out == 0
    # channel-shared masks
    assert np.all(is_salt.all(axis=-1) == is_salt.any(axis=-1))
    assert np.all(is_pepper.all(axis=-1) == is_pepper.any(axis=-1))
    frac_salt = is_salt[..., 0].mean()
    frac_pepper = is_pepper[..., 0].mean()
    assert 0.02 < frac_salt < 0.08
    # pepper overrides salt, so pepper fraction is the full p
    assert 0.02 < frac_pepper < 0.08


def test_degrade_pipeline_shapes_and_jit():
    key = jax.random.key(2)
    hr = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 64, 64, 3)), jnp.float32)
    fn = jax.jit(lambda k, x: degrade_pipeline(k, x, factor=4,
                                               noise_type={"type": "Gaussian", "std": 0.05}))
    lr = fn(key, hr)
    assert lr.shape == (1, 16, 16, 3)
    a = np.asarray(lr)
    assert a.min() >= 0 and a.max() <= 255
