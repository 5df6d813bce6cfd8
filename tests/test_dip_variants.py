"""DIP engine variants: LBFGS optimizer, meshgrid input, net+input opt_over
(the rest of the utils/DIP.py surface), and avg/max skip-net downsampling."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.engine.dip import DIPConfig, dip_superresolve
from tpusr.models.skip import SkipNet
from tests.test_dip_engine import TINY, _make_pair


def _cfg(**kw):
    return dataclasses.replace(TINY, **kw)


def test_lbfgs_optimizer_improves_loss():
    lr, hr = _make_pair(h=32, w=32)
    cfg = _cfg(optimizer="lbfgs", num_iter=20, log_freq=10, reg_noise_std=0.0)
    resolved, curves = dip_superresolve(lr, hr, jax.random.key(0), cfg)
    losses = np.asarray(curves["loss"])
    assert resolved.shape == hr.shape
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_meshgrid_input():
    lr, hr = _make_pair(h=32, w=32)
    cfg = _cfg(input_method="meshgrid", input_depth=2, num_iter=20, log_freq=10)
    resolved, curves = dip_superresolve(lr, hr, jax.random.key(0), cfg)
    assert resolved.shape == hr.shape
    assert np.all(np.isfinite(np.asarray(curves["loss"])))


def test_optimize_input_too():
    lr, hr = _make_pair(h=32, w=32)
    cfg = _cfg(opt_over="net,input", num_iter=20, log_freq=10,
               reg_noise_std=0.0)
    r1, c1 = dip_superresolve(lr, hr, jax.random.key(0), cfg)
    losses = np.asarray(c1["loss"])
    assert losses[-1] < losses[0]
    # input optimization must actually change the trajectory vs net-only
    r2, _ = dip_superresolve(lr, hr, jax.random.key(0),
                             _cfg(num_iter=20, log_freq=10, reg_noise_std=0.0))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_optimize_downsampler():
    """opt_over='net,down' (utils/DIP.py:50-57): the 2-D kernel leaf must
    receive gradient and change the trajectory vs net-only."""
    lr, hr = _make_pair(h=32, w=32)
    cfg = _cfg(opt_over="net,down", num_iter=20, log_freq=10,
               reg_noise_std=0.0)
    r1, c1 = dip_superresolve(lr, hr, jax.random.key(0), cfg)
    losses = np.asarray(c1["loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    r2, _ = dip_superresolve(lr, hr, jax.random.key(0),
                             _cfg(num_iter=20, log_freq=10, reg_noise_std=0.0))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_downsampler_conv2d_with_matches_separable():
    """conv2d_with(outer(taps,taps)) == the separable fast path."""
    from tpusr.ops.resample import Downsampler

    ds = Downsampler(n_planes=3, factor=4, kernel_type="lanczos2",
                     phase=0.5, preserve_size=True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                    jnp.float32)
    sep = ds(x)
    full = ds.conv2d_with(x, jnp.asarray(ds.kernel, jnp.float32))
    np.testing.assert_allclose(np.asarray(sep), np.asarray(full), atol=1e-5)


def test_opt_over_rejects_unknown():
    lr, hr = _make_pair(h=32, w=32)
    cfg = _cfg(opt_over="net,bogus", num_iter=4, log_freq=2)
    import pytest

    with pytest.raises(ValueError, match="bogus"):
        dip_superresolve(lr, hr, jax.random.key(0), cfg)


def test_skipnet_pool_downsample_modes():
    for mode in ("avg", "max"):
        net = SkipNet(num_input_channels=4, num_channels_down=(8, 8),
                      num_channels_up=(8, 8), num_channels_skip=(2, 2),
                      downsample_mode=mode, pad="reflection",
                      upsample_mode="bilinear")
        x = jnp.zeros((1, 32, 32, 4))
        v = net.init(jax.random.key(0), x)
        y = net.apply(v, x, mutable=["batch_stats"])[0]
        assert y.shape == (1, 32, 32, 3)
