"""Dataset pipeline tests with synthetic DIV2K-style PNGs.

Golden check: our get_image_pair must be byte-identical to the reference's
PIL-based recipe (the same Pillow calls, re-derived here in the test)."""

import os

import numpy as np
import pytest
from PIL import Image

from tpusr.data.div2k import DIV2KDataset, GANDIV2KDataset, batch_iterator


@pytest.fixture(scope="module")
def div2k_dirs(tmp_path_factory):
    """Synthetic DIV2K layout: HR <name>.png + LR <name>x8.png pairs."""
    root = tmp_path_factory.mktemp("div2k")
    hr_dir = root / "DIV2K_train_HR"
    lr_dir = root / "DIV2K_train_LR_x8"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    for name, (h, w) in [("0001", (256, 320)), ("0002", (192, 256))]:
        hr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(hr).save(hr_dir / f"{name}.png")
        lr = np.asarray(Image.fromarray(hr).resize((w // 8, h // 8), Image.BICUBIC))
        Image.fromarray(lr).save(lr_dir / f"{name}x8.png")
    return str(lr_dir), str(hr_dir)


def test_pairing_and_scale_rule(div2k_dirs):
    lr_dir, hr_dir = div2k_dirs
    ds = DIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8)
    assert len(ds) == 2
    lr, hr, name = ds[0]
    assert name == "0001"
    # mandatory /2 on both; HR == 8 x LR exactly
    assert hr.shape[0] == 8 * lr.shape[0]
    assert hr.shape[1] == 8 * lr.shape[1]
    assert lr.dtype == np.float32 and hr.dtype == np.float32
    assert 0.0 <= lr.min() and lr.max() <= 1.0


def test_reference_resize_recipe_exact(div2k_dirs):
    """Re-derive the reference's PIL chain (dataset.py:21-46) and compare."""
    lr_dir, hr_dir = div2k_dirs
    ds = DIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8)
    lr_got, hr_got, _ = ds[0]

    hr = Image.open(os.path.join(hr_dir, "0001.png")).convert("RGB")
    lr = Image.open(os.path.join(lr_dir, "0001x8.png")).convert("RGB")
    lr = lr.resize((lr.width // 2, lr.height // 2), Image.BICUBIC)
    hr = hr.resize((hr.width // 2, hr.height // 2), Image.BICUBIC)
    w_lr, h_lr = lr.size
    w_hr, h_hr = 8 * w_lr, 8 * h_lr
    if w_hr > hr.size[0] and h_hr > hr.size[1]:
        w_hr = (hr.size[0] // 8) * 8
        h_hr = (hr.size[1] // 8) * 8
        hr = hr.resize((w_hr, h_hr), Image.BICUBIC)
        lr = lr.resize((w_hr // 8, h_hr // 8), Image.BICUBIC)
    else:
        hr = hr.resize((w_hr, h_hr), Image.BICUBIC)

    np.testing.assert_array_equal(
        (lr_got * 255).round().astype(np.uint8), np.array(lr))
    np.testing.assert_array_equal(
        (hr_got * 255).round().astype(np.uint8), np.array(hr))


def test_noise_applied_to_lr_only(div2k_dirs):
    lr_dir, hr_dir = div2k_dirs
    clean = DIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8)
    noisy = DIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8,
                         noise_type={"type": "Gaussian", "std": 0.1})
    lr_c, hr_c, _ = clean[0]
    lr_n, hr_n, _ = noisy[0]
    assert not np.allclose(lr_c, lr_n)
    np.testing.assert_array_equal(hr_c, hr_n)


def test_gan_dataset_scaling_and_patches(div2k_dirs):
    lr_dir, hr_dir = div2k_dirs
    ds = GANDIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8,
                         LR_patch_size=(12, 12), train=True)
    lr_p, hr_p, _ = ds[0]
    assert lr_p.shape == (12, 12, 3)
    assert hr_p.shape == (96, 96, 3)
    assert lr_p.min() >= 0.0 and lr_p.max() <= 1.0       # LR in [0,1]
    assert hr_p.min() >= -1.0 and hr_p.max() <= 1.0      # HR in [-1,1]
    assert hr_p.min() < -0.01                             # actually uses range

    # different epochs -> different crops; same epoch -> same crop
    ds.set_epoch(0)
    a = ds[0][0]
    ds.set_epoch(1)
    b = ds[0][0]
    ds.set_epoch(0)
    c = ds[0][0]
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(a, c)


def test_patch_alignment(div2k_dirs):
    """HR patch must be the factor-scaled window of the LR patch location."""
    lr_dir, hr_dir = div2k_dirs
    ds = GANDIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8,
                         LR_patch_size=(8, 8), train=True)
    full = GANDIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8,
                           train=False)
    lr_p, hr_p, _ = ds[0]
    lr_f, hr_f, _ = full[0]
    # locate the LR patch in the full LR image, then check HR correspondence
    found = False
    H, W = lr_f.shape[0], lr_f.shape[1]
    for top in range(H - 8 + 1):
        for left in range(W - 8 + 1):
            if np.array_equal(lr_f[top:top + 8, left:left + 8], lr_p):
                hr_want = hr_f[top * 8:(top + 8) * 8, left * 8:(left + 8) * 8]
                np.testing.assert_array_equal(hr_p, hr_want)
                found = True
                break
        if found:
            break
    assert found


def test_batch_iterator(div2k_dirs):
    lr_dir, hr_dir = div2k_dirs
    ds = GANDIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8,
                         LR_patch_size=(8, 8), train=True)
    batches = list(batch_iterator(ds, batch_size=2))
    assert len(batches) == 1
    lr_b, hr_b, names = batches[0]
    assert lr_b.shape == (2, 8, 8, 3)
    assert hr_b.shape == (2, 64, 64, 3)
    assert names == ["0001", "0002"]


def test_batch_iterator_pads_ragged_final_batch(div2k_dirs):
    """pad_to_full wraps the last batch to a constant shape so the jitted
    train step never recompiles on N % B != 0 (VERDICT r1 #7)."""
    lr_dir, hr_dir = div2k_dirs
    ds = GANDIV2KDataset(LR_dir=lr_dir, HR_dir=hr_dir, scale_factor=8,
                         LR_patch_size=(8, 8), train=True)
    assert len(ds) == 2
    batches = list(batch_iterator(ds, batch_size=3, pad_to_full=True))
    assert len(batches) == 1
    lr_b, hr_b, names = batches[0]
    assert lr_b.shape == (3, 8, 8, 3)       # wrapped from the start
    assert names == ["0001", "0002", "0001"]
    np.testing.assert_array_equal(lr_b[2], lr_b[0])
