"""Regression tests for the round-1 review findings."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.engine.gan import GANTrainConfig, create_gan_state, generator_forward
from tpusr.io.checkpoint import (
    disc_feature_hw,
    export_torch_discriminator,
    import_torch_discriminator,
)
from tpusr.models.srgan import Discriminator
from tpusr.parallel.spatial import tiled_generator_forward


def test_disc_feature_hw_odd_sizes():
    """200 -> 100 -> 50 -> 25 -> 13, NOT 200//16=12."""
    assert disc_feature_hw(192) == 12
    assert disc_feature_hw(200) == 13
    assert disc_feature_hw(64) == 4
    assert disc_feature_hw(100) == 7
    # agree with the actual model
    d = Discriminator()
    for n in (64, 96, 200):
        v = d.init(jax.random.key(0), jnp.zeros((1, n, n, 3)))
        dense_in = v["params"]["dense1"]["Dense_0"]["kernel"].shape[0]
        assert dense_in == disc_feature_hw(n) ** 2 * 512, n


def test_discriminator_export_odd_patch_roundtrip():
    """Export at hr_patch=200 must not crash and must round-trip."""
    d = Discriminator()
    v = d.init(jax.random.key(1), jnp.zeros((1, 200, 200, 3)))
    sd = export_torch_discriminator(v["params"], v["batch_stats"], hr_patch=200)
    params, stats = import_torch_discriminator(sd, hr_patch=200)
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tiled_forward_degenerate_tail_tile():
    """h < n_tiles*core must not duplicate rows (was (1,14,..) for h=6,n=4)."""
    cfg = GANTrainConfig(factor=2, residual_blocks_count=1)
    state = create_gan_state(jax.random.key(0), GANTrainConfig(
        factor=2, residual_blocks_count=1, hr_patch=16), 1e-4)
    x = jnp.asarray(np.random.default_rng(0).random((1, 6, 8, 3)), jnp.float32)
    full = generator_forward(state.params_G, state.stats_G, x, cfg, train=False)
    tiled = tiled_generator_forward(state.params_G, state.stats_G, x, cfg,
                                    n_tiles=4, halo=4)
    assert tiled.shape == full.shape
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)


def test_legacy_scale_flag():
    from tpusr.data.div2k import GANDIV2KDataset

    lr = np.full((4, 4, 3), 0.5, np.float32)
    hr = np.full((16, 16, 3), 0.5, np.float32)
    l2, h2 = GANDIV2KDataset.scale_images(lr, hr)
    np.testing.assert_allclose(l2, 0.5)
    np.testing.assert_allclose(h2, 0.0)
    l3, h3 = GANDIV2KDataset.scale_images(lr, hr, legacy_scale=True)
    np.testing.assert_allclose(l3, 0.5 / 255.0)
    np.testing.assert_allclose(h3, 0.5 / 255.0 * 2 - 1)
