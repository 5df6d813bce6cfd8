"""Metric tests: analytic PSNR cases and an independent SSIM oracle."""

import numpy as np
import jax.numpy as jnp

from tpusr.engine.metrics import psnr, ssim


def test_psnr_analytic():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.5)
    # data_range given: psnr = 10 log10(1 / 0.25) = 6.0206
    assert abs(float(psnr(a, b, data_range=1.0)) - 6.0206) < 1e-3


def test_psnr_inferred_data_range():
    """torchmetrics default: data_range = target.max() - target.min()."""
    t = jnp.asarray(np.linspace(0, 2, 48).reshape(1, 4, 4, 3), jnp.float32)
    p = t + 0.1
    want = 10 * np.log10(4.0 / 0.01)
    assert abs(float(psnr(p, t)) - want) < 1e-3


def test_ssim_identical_images():
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    vals = []
    for std in (0.01, 0.05, 0.2):
        y = np.clip(x + rng.normal(0, std, x.shape), 0, 1).astype(np.float32)
        vals.append(float(ssim(jnp.asarray(y), jnp.asarray(x))))
    assert vals[0] > vals[1] > vals[2]
    assert vals[0] > 0.9


def _gauss1d(n=11, sigma=1.5):
    x = np.arange(n) - (n - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _valid_filter2d(img, g):
    """Separable valid-mode filtering of a 2-D array with 1-D window g."""
    k = len(g)
    h, w = img.shape
    # rows
    tmp = np.zeros((h, w - k + 1))
    for j in range(w - k + 1):
        tmp[:, j] = img[:, j:j + k] @ g
    out = np.zeros((h - k + 1, w - k + 1))
    for i in range(h - k + 1):
        out[i, :] = g @ tmp[i:i + k, :]
    return out


def test_ssim_matches_independent_oracle():
    rng = np.random.default_rng(2)
    x = rng.random((20, 24)).astype(np.float64)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)

    g = _gauss1d()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x = _valid_filter2d(x, g)
    mu_y = _valid_filter2d(y, g)
    sxx = _valid_filter2d(x * x, g) - mu_x ** 2
    syy = _valid_filter2d(y * y, g) - mu_y ** 2
    sxy = _valid_filter2d(x * y, g) - mu_x * mu_y
    want = np.mean(((2 * mu_x * mu_y + c1) * (2 * sxy + c2))
                   / ((mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)))

    got = float(ssim(jnp.asarray(x[None, :, :, None], jnp.float32),
                     jnp.asarray(y[None, :, :, None], jnp.float32)))
    assert abs(got - want) < 1e-4
