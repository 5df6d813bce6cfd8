"""Pallas degradation kernels.

The TPU interpreter's prng_random_bits is a zero stub on CPU, so these tests
require a real TPU backend (they skip on the CI CPU mesh). Run them on
hardware with:  JAX_PLATFORMS= python -m pytest tests/test_pallas.py --no-header
after removing the conftest CPU force, or via tools/run_pallas_on_tpu.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.ops.pallas_degrade import (
    pallas_add_gaussian_noise,
    pallas_add_salt_pepper_noise,
)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU PRNG primitives have no CPU interpreter implementation",
)


def test_gaussian_kernel_stats():
    img = jnp.full((64, 128, 3), 128.0)
    out = np.asarray(pallas_add_gaussian_noise(img, 7, std=0.1, interpret=False))
    assert out.shape == (64, 128, 3)
    assert out.min() >= 0 and out.max() <= 255
    assert np.all(out == np.floor(out))
    assert 20 < out.std() < 32          # std ~ 25.5
    assert abs(out.mean() - 128) < 3


def test_gaussian_kernel_deterministic_and_seed_sensitive():
    img = jnp.full((32, 128, 3), 100.0)
    a = np.asarray(pallas_add_gaussian_noise(img, 1, std=0.2, interpret=False))
    b = np.asarray(pallas_add_gaussian_noise(img, 1, std=0.2, interpret=False))
    c = np.asarray(pallas_add_gaussian_noise(img, 2, std=0.2, interpret=False))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gaussian_kernel_tiles_differ():
    """Rows in different grid tiles must not repeat the same noise."""
    img = jnp.full((512, 128, 3), 128.0)
    out = np.asarray(pallas_add_gaussian_noise(img, 3, std=0.2, interpret=False))
    assert not np.array_equal(out[:256], out[256:])


def test_salt_pepper_kernel():
    img = jnp.full((128, 128, 3), 128.0)
    out = np.asarray(pallas_add_salt_pepper_noise(img, 5, s=0.05, p=0.05,
                                                  interpret=False))
    is_salt = out == 255
    is_pepper = out == 0
    # channel-shared masks
    assert np.all(is_salt.all(axis=-1) == is_salt.any(axis=-1))
    assert np.all(is_pepper.all(axis=-1) == is_pepper.any(axis=-1))
    assert 0.02 < is_salt[..., 0].mean() < 0.08
    assert 0.02 < is_pepper[..., 0].mean() < 0.08
    untouched = (~is_salt[..., 0]) & (~is_pepper[..., 0])
    assert np.all(out[untouched] == 128.0)
