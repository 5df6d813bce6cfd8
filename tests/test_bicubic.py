"""Golden tests: tpusr bicubic resize vs Pillow (the reference's resampler).

Pillow's uint8 path uses fixed-point accumulation, ours is float32, so after
quantization we allow ±1 LSB on a small fraction of pixels.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from tpusr.ops.bicubic import (
    pil_downsample,
    resize_bicubic,
    resize_bicubic_u8,
    resize_matrix,
)


def _rand_img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


SIZES = [
    ((64, 48), (32, 24)),    # /2 downsample (the dataset's mandatory step)
    ((63, 49), (31, 24)),    # odd sizes, floor-div semantics
    ((40, 40), (20, 20)),
    ((33, 57), (16, 28)),
    ((24, 24), (48, 48)),    # upscale (HR = factor * LR resize path)
    ((20, 30), (160, 240)),  # x8 upscale
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_u8_path_is_byte_exact_vs_pillow(in_hw, out_hw):
    (h, w), (oh, ow) = in_hw, out_hw
    img = _rand_img(h, w)
    pil = np.asarray(
        Image.fromarray(img).resize((ow, oh), resample=Image.BICUBIC)
    ).astype(np.int32)
    ours = np.asarray(resize_bicubic_u8(jnp.asarray(img), oh, ow))
    np.testing.assert_array_equal(ours, pil)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_float_path_matches_float64_reference(in_hw, out_hw):
    """The float path is the exact separable filter (no uint8 intermediate)."""
    (h, w), (oh, ow) = in_hw, out_hw
    img = _rand_img(h, w).astype(np.float64)
    mh = resize_matrix(h, oh)
    mw = resize_matrix(w, ow)
    tmp = np.einsum("oh,hwc->owc", mh, img)
    want = np.einsum("pw,owc->opc", mw, tmp)
    got = np.asarray(resize_bicubic(jnp.asarray(img, jnp.float32), oh, ow))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


def test_float_path_close_to_pillow_on_smooth_images():
    """On natural (smooth) content the float path tracks Pillow to ~1 LSB."""
    yy, xx = np.mgrid[0:64, 0:96]
    img = np.stack(
        [
            127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            127 + 80 * np.cos(xx / 15.0 + yy / 11.0),
            np.clip(xx * 2.0, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    for (oh, ow) in [(32, 48), (128, 192)]:
        pil = np.asarray(
            Image.fromarray(img).resize((ow, oh), resample=Image.BICUBIC)
        ).astype(np.int32)
        ours = resize_bicubic(jnp.asarray(img, dtype=jnp.float32), oh, ow)
        ours = np.clip(np.round(np.asarray(ours)), 0, 255).astype(np.int32)
        diff = np.abs(ours - pil)
        assert diff.max() <= 2, f"max LSB diff {diff.max()}"
        assert diff.mean() < 0.5


def test_pil_downsample_size_rule():
    img = jnp.zeros((1, 37, 53, 3))
    out = pil_downsample(img, 2)
    assert out.shape == (1, 18, 26, 3)


def test_resize_matrix_rows_sum_to_one():
    for n_in, n_out in [(64, 32), (17, 5), (8, 24)]:
        m = resize_matrix(n_in, n_out)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_batched_matches_single():
    imgs = np.stack([_rand_img(32, 32, s) for s in range(4)]).astype(np.float32)
    batched = resize_bicubic(jnp.asarray(imgs), 16, 16)
    singles = jnp.stack([resize_bicubic(jnp.asarray(i), 16, 16) for i in imgs])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), atol=1e-4)
