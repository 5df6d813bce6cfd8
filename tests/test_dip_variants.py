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


def test_lbfgs_fixed_step_matches_torch():
    """Golden: lbfgs_fixed_step_tx reproduces torch.optim.LBFGS with
    line_search_fn=None (the reference's configuration, utils/DIP.py:30:
    lr is a FIXED step; tolerance_grad/_change=-1 disable early exits).

    Small dense least-squares problem, identical f32 init on both sides;
    parameter trajectories compared after every iteration.
    """
    import torch

    from tpusr.engine.dip import lbfgs_fixed_step_tx

    rng = np.random.default_rng(0)
    n, m = 12, 8
    A = rng.standard_normal((n, m)).astype(np.float32)
    b = rng.standard_normal((n,)).astype(np.float32)
    x0 = rng.standard_normal((m,)).astype(np.float32)
    lr_step, mem, iters = 0.7, 10, 15

    # torch side: one .step(closure) call runs max_iter iterations
    xt = torch.tensor(x0, requires_grad=True)
    At, bt = torch.tensor(A), torch.tensor(b)
    opt = torch.optim.LBFGS([xt], lr=lr_step, max_iter=iters,
                            history_size=mem, line_search_fn=None,
                            tolerance_grad=-1, tolerance_change=-1)
    traj_torch = []

    def closure():
        opt.zero_grad()
        loss = torch.sum((At @ xt - bt) ** 2)
        loss.backward()
        traj_torch.append(xt.detach().clone().numpy())
        return loss

    opt.step(closure)

    # jax side
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    loss_fn = lambda x: jnp.sum((Aj @ x - bj) ** 2)
    tx = lbfgs_fixed_step_tx(lr_step, mem)
    x = jnp.asarray(x0)
    state = tx.init(x)
    import optax

    for i in range(iters):
        g = jax.grad(loss_fn)(x)
        updates, state = tx.update(g, state, x)
        x = optax.apply_updates(x, updates)
        # traj_torch[i] is the params BEFORE torch's i-th update; compare
        # our post-update x to torch's pre-update params at i+1
        if i + 1 < len(traj_torch):
            np.testing.assert_allclose(np.asarray(x), traj_torch[i + 1],
                                       rtol=2e-4, atol=2e-4)
    # endpoints agree (torch's traj records pre-update params, so its final
    # point is xt itself) and the fixed step made real progress
    np.testing.assert_allclose(np.asarray(x), xt.detach().numpy(),
                               rtol=2e-4, atol=2e-4)
    assert float(loss_fn(x)) < float(loss_fn(jnp.asarray(x0))) * 0.1


def test_lbfgs_fixed_engine_mode_improves_loss():
    lr, hr = _make_pair(h=32, w=32)
    cfg = _cfg(optimizer="lbfgs", lbfgs_line_search="fixed", num_iter=20,
               log_freq=10, reg_noise_std=0.0, learning_rate=0.5)
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
