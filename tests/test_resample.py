"""Golden tests for the L0 resampling kernels.

The 2-D kernels are checked against a literal element-by-element
re-derivation of the reference closed forms (utils/downsampler.py:73-135),
written here independently with explicit loops, and the separable depthwise
op is checked against a brute-force dense 2-D convolution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpusr.ops.resample import Downsampler, get_kernel, resolve_kernel_spec


def golden_kernel(factor, kernel_type, phase, kernel_width, support=None, sigma=None):
    """Loop-form transcription of the reference kernel math (for testing)."""
    if phase == 0.5 and kernel_type != "box":
        kernel = np.zeros((kernel_width - 1, kernel_width - 1))
    else:
        kernel = np.zeros((kernel_width, kernel_width))

    if kernel_type == "box":
        kernel[:] = 1.0 / (kernel_width * kernel_width)
    elif kernel_type == "gauss":
        center = (kernel_width + 1.0) / 2.0
        sigma_sq = sigma * sigma
        for i in range(1, kernel.shape[0] + 1):
            for j in range(1, kernel.shape[1] + 1):
                di = (i - center) / 2.0
                dj = (j - center) / 2.0
                kernel[i - 1][j - 1] = np.exp(-(di * di + dj * dj) / (2 * sigma_sq))
                kernel[i - 1][j - 1] /= 2.0 * np.pi * sigma_sq
    elif kernel_type == "lanczos":
        center = (kernel_width + 1) / 2.0
        for i in range(1, kernel.shape[0] + 1):
            for j in range(1, kernel.shape[1] + 1):
                if phase == 0.5:
                    di = abs(i + 0.5 - center) / factor
                    dj = abs(j + 0.5 - center) / factor
                else:
                    di = abs(i - center) / factor
                    dj = abs(j - center) / factor
                val = 1.0
                if di != 0:
                    val *= support * np.sin(np.pi * di) * np.sin(np.pi * di / support)
                    val /= np.pi * np.pi * di * di
                if dj != 0:
                    val *= support * np.sin(np.pi * dj) * np.sin(np.pi * dj / support)
                    val /= np.pi * np.pi * dj * dj
                kernel[i - 1][j - 1] = val
    kernel /= kernel.sum()
    return kernel


CASES = [
    # (factor, named_type, phase)
    (2, "lanczos2", 0.5),
    (4, "lanczos2", 0.5),
    (8, "lanczos2", 0.5),
    (16, "lanczos2", 0.5),
    (2, "lanczos2", 0),
    (4, "lanczos3", 0.5),
    (8, "lanczos3", 0),
    (2, "gauss12", 0),
    (2, "gauss1sq2", 0),
]


@pytest.mark.parametrize("factor,name,phase", CASES)
def test_kernel_matches_reference_formula(factor, name, phase):
    ktype, kwidth, support, sigma = resolve_kernel_spec(factor, name)
    ours = get_kernel(factor, ktype, phase, kwidth, support, sigma)
    gold = golden_kernel(factor, ktype, phase, kwidth, support, sigma)
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, atol=1e-12)


def test_box_kernel():
    ours = get_kernel(2, "box", 0.5, 5)
    gold = golden_kernel(2, "box", 0.5, 5)
    np.testing.assert_allclose(ours, gold, atol=1e-15)


def dense_downsample(x_nhwc, kernel2d, factor, pad):
    """Brute-force NumPy reference: edge pad + per-channel 2-D valid conv."""
    x = np.asarray(x_nhwc)
    if pad:
        x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    n, h, w, c = x.shape
    kh, kw = kernel2d.shape
    oh = (h - kh) // factor + 1
    ow = (w - kw) // factor + 1
    out = np.zeros((n, oh, ow, c), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * factor:i * factor + kh, j * factor:j * factor + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, kernel2d)
    return out


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("preserve_size", [True, False])
def test_downsampler_matches_dense_conv(factor, preserve_size):
    rng = np.random.default_rng(0)
    x = rng.random((1, 4 * factor + 9, 4 * factor + 13, 3)).astype(np.float32)
    ds = Downsampler(3, factor, "lanczos2", phase=0.5, preserve_size=preserve_size)
    got = np.asarray(ds(jnp.asarray(x)))
    want = dense_downsample(x, ds.kernel, factor, ds.pad if preserve_size else 0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_preserve_size_output_is_input_over_factor():
    for factor in (2, 4, 8):
        h, w = 8 * factor, 16 * factor
        x = jnp.ones((1, h, w, 3))
        ds = Downsampler(3, factor, "lanczos2", phase=0.5, preserve_size=True)
        y = ds(x)
        assert y.shape == (1, h // factor, w // factor, 3)
        # Constant image must be preserved by a unit-DC filter.
        np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-5)
