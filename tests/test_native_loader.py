"""Native (C++/libpng) loader vs Pillow: byte-identical, or it doesn't ship.

The native path replaces the host-side decode+bicubic chain of
tpusr/data/div2k.py get_image_pair (reference: dataset.py:9-46 +
utils/degradation.py:19-20). Every test here asserts EXACT byte equality
against Pillow itself — the loader is only enabled when that holds.
"""

import os

import numpy as np
import pytest
from PIL import Image

from tpusr import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def img(tmp_path_factory):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (137, 201, 3), np.uint8)
    path = tmp_path_factory.mktemp("png") / "x.png"
    Image.fromarray(arr).save(path)
    return arr, str(path)


def test_decode_matches_pil(img):
    arr, path = img
    got = native.decode_png(path)
    want = np.array(Image.open(path).convert("RGB"))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("oh,ow", [(68, 100), (137, 402), (274, 100),
                                   (17, 25), (137, 201)])
def test_resize_matches_pil(img, oh, ow):
    arr, _ = img
    got = native.resize_bicubic_u8(arr, oh, ow)
    want = np.array(Image.fromarray(arr).resize((ow, oh), Image.BICUBIC))
    assert np.array_equal(got, want)


def test_grayscale_png_decodes_like_pil_convert_rgb(tmp_path):
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (50, 61), np.uint8)
    path = tmp_path / "g.png"
    Image.fromarray(gray, mode="L").save(path)
    got = native.decode_png(str(path))
    want = np.array(Image.open(path).convert("RGB"))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("downsample", [False, True])
def test_get_image_pair_native_equals_pil(tmp_path, monkeypatch, downsample):
    """Whole dataset chain: native path == PIL path byte-for-byte."""
    from tpusr.data.div2k import DatasetConfig, get_image_pair

    rng = np.random.default_rng(3)
    hr_dir = tmp_path / "HR"
    lr_dir = tmp_path / "LR"
    hr_dir.mkdir()
    lr_dir.mkdir()
    hr = rng.integers(0, 256, (257, 321, 3), np.uint8)
    Image.fromarray(hr).save(hr_dir / "0001.png")
    lr = np.asarray(Image.fromarray(hr).resize((321 // 8, 257 // 8),
                                               Image.BICUBIC))
    Image.fromarray(lr).save(lr_dir / "0001x8.png")

    config = DatasetConfig(LR_dir=str(lr_dir), HR_dir=str(hr_dir),
                           scale_factor=8, downsample=downsample)
    nat = get_image_pair(config, "0001.png", np.random.default_rng(0))
    monkeypatch.setattr(native, "available", lambda: False)
    ref = get_image_pair(config, "0001.png", np.random.default_rng(0))
    assert np.array_equal(nat[0], ref[0])
    assert np.array_equal(nat[1], ref[1])
    assert nat[2] == ref[2]
