"""Integration: a tiny DIP run on CPU must reconstruct and report curves.

Mirrors SURVEY.md §4's integration-test plan: small net, few iterations,
assert monotone-ish loss and improved PSNR against the degraded start.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.engine.dip import DIPConfig, dip_superresolve
from tpusr.ops.resample import downsample_lanczos

TINY = DIPConfig(
    factor=2,
    num_iter=60,
    log_freq=20,
    learning_rate=0.01,
    reg_noise_std=0.03,
    input_depth=8,
    skip_n33d=16,
    skip_n33u=16,
    skip_n11=4,
    num_scales=3,
)


def _make_pair(h=48, w=48, factor=2, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    hr = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 5.0),
            0.5 + 0.4 * np.cos(yy / 7.0),
            0.5 + 0.3 * np.sin((xx + yy) / 9.0),
        ],
        axis=-1,
    ).astype(np.float32)[None]
    hr += rng.normal(0, 0.01, hr.shape).astype(np.float32)
    hr = np.clip(hr, 0, 1)
    lr = np.asarray(downsample_lanczos(jnp.asarray(hr), factor))
    return jnp.asarray(lr), jnp.asarray(hr)


def test_dip_improves_loss_and_psnr():
    lr, hr = _make_pair()
    resolved, curves = dip_superresolve(lr, hr, jax.random.key(0), TINY)
    assert resolved.shape == hr.shape
    losses = np.asarray(curves["loss"])
    psnrs = np.asarray(curves["psnr"])
    assert losses.shape == (3,)
    assert psnrs.shape == (3,)
    # optimization makes progress
    assert losses[-1] < losses[0]
    assert psnrs[-1] > psnrs[0]
    assert np.all(np.isfinite(losses))
    # lpips column is NaN without weights (documented)
    assert np.all(np.isnan(np.asarray(curves["lpips"])))


def test_dip_deterministic_per_key():
    lr, hr = _make_pair()
    r1, _ = dip_superresolve(lr, hr, jax.random.key(7), TINY)
    r2, _ = dip_superresolve(lr, hr, jax.random.key(7), TINY)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def _zero_lpips(a, b):
    """Stand-in LPIPS so the NaN-availability sentinel doesn't trip the
    NaN debugger (the sentinel is the one intentional NaN in the program)."""
    import jax.numpy as jnp

    return jnp.float32(0.0)


def test_dip_smoke_under_nan_debugging():
    """SURVEY §5 sanitizer row: the jitted loop is clean under jax_debug_nans."""
    lr, hr = _make_pair(h=32, w=32)
    cfg = TINY.__class__(**{**TINY.__dict__, "num_iter": 10, "log_freq": 5})
    jax.config.update("jax_debug_nans", True)
    try:
        resolved, curves = dip_superresolve(lr, hr, jax.random.key(3), cfg,
                                            lpips_fn=_zero_lpips)
        assert np.all(np.isfinite(np.asarray(resolved)))
        assert np.all(np.isfinite(np.asarray(curves["psnr"])))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_dip_remainder_iterations():
    cfg = TINY.__class__(**{**TINY.__dict__, "num_iter": 25, "log_freq": 10})
    lr, hr = _make_pair(h=32, w=32)
    resolved, curves = dip_superresolve(lr, hr, jax.random.key(0), cfg)
    assert np.asarray(curves["psnr"]).shape == (2,)
    assert resolved.shape == hr.shape
