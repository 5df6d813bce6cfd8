"""On-device multi-epoch GAN trainer (engine/gan_epochs.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.engine.gan import GANTrainConfig, create_gan_state
from tpusr.engine.gan_epochs import _crop_pair, gan_train_epochs, stack_dataset_for_device

CFG = GANTrainConfig(factor=4, batch_size=2, hr_patch=32,
                     residual_blocks_count=2)


def _stacks(n=4, lh=20, lw=24, seed=0):
    rng = np.random.default_rng(seed)
    f = CFG.factor
    lr = rng.integers(0, 256, (n, lh, lw, 3), dtype=np.uint8)
    hr = rng.integers(0, 256, (n, lh * f, lw * f, 3), dtype=np.uint8)
    valid = np.tile(np.asarray([[lh, lw]], np.int32), (n, 1))
    return jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(valid)


def test_crop_pair_alignment_and_scaling():
    f = CFG.factor
    rng = np.random.default_rng(1)
    lr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    hr = np.zeros((64, 64, 3), dtype=np.uint8)
    # HR = upsampled-index marker of LR so alignment is checkable
    for i in range(64):
        for j in range(64):
            hr[i, j] = lr[i // f, j // f]
    lr_p, hr_p = _crop_pair(jnp.asarray(lr), jnp.asarray(hr),
                            jnp.asarray([16, 16]), jax.random.key(0),
                            lr_patch=8, factor=f)
    assert lr_p.shape == (8, 8, 3)
    assert hr_p.shape == (32, 32, 3)
    # every HR 4x4 block equals its LR pixel (alignment)
    lrv = np.asarray(lr_p)
    hrv = np.asarray((hr_p + 1) / 2)  # undo [-1,1]
    for bi in range(8):
        for bj in range(8):
            block = hrv[bi * f:(bi + 1) * f, bj * f:(bj + 1) * f]
            assert np.allclose(block, lrv[bi, bj], atol=1e-6), (bi, bj)
    assert 0.0 <= lrv.min() and lrv.max() <= 1.0


def test_crop_pair_legacy_scale():
    """config.legacy_scale reproduces dataset.py:151-157 (second /255 on the
    already-[0,1] tensors) inside the on-device cropper."""
    rng = np.random.default_rng(2)
    lr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    hr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    args = (jnp.asarray(lr), jnp.asarray(hr), jnp.asarray([16, 16]),
            jax.random.key(0))
    lr_n, hr_n = _crop_pair(*args, lr_patch=8, factor=4)
    lr_l, hr_l = _crop_pair(*args, lr_patch=8, factor=4, legacy_scale=True)
    np.testing.assert_allclose(np.asarray(lr_l), np.asarray(lr_n) / 255.0,
                               rtol=1e-6)
    # hr: (u/255/255)*2-1 vs (u/255)*2-1  ->  (hr_n+1)/255 - 1
    np.testing.assert_allclose(np.asarray(hr_l),
                               (np.asarray(hr_n) + 1.0) / 255.0 - 1.0,
                               atol=1e-6)


def test_epochs_trainer_legacy_scale_runs():
    """--legacy_scale parity runs ride the on-device trainer (VERDICT r1 #8)."""
    lr, hr, valid = _stacks()
    cfg = GANTrainConfig(factor=4, batch_size=2, hr_patch=32,
                         residual_blocks_count=2, legacy_scale=True)
    state = create_gan_state(jax.random.key(0), cfg, 1e-4)
    new_state, logs = gan_train_epochs(
        state, lr, hr, valid, jax.random.key(1), cfg, 1e-4, n_epochs=1)
    assert np.all(np.isfinite(np.asarray(logs["losses_G"])))
    assert int(new_state.step) == 2


def test_epochs_trainer_runs_and_updates():
    lr, hr, valid = _stacks()
    state = create_gan_state(jax.random.key(0), CFG, 1e-4)
    new_state, logs = gan_train_epochs(
        state, lr, hr, valid, jax.random.key(1), CFG, 1e-4, n_epochs=3)
    assert logs["losses_D"].shape == (3, 2)   # 4 imgs / batch 2 = 2 steps
    assert logs["losses_G"].shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(logs["losses_D"])))
    assert np.isfinite(float(logs["psnr"]))
    assert int(new_state.step) == 6
    a = jax.tree.leaves(state.params_G)[0]
    b = jax.tree.leaves(new_state.params_G)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_epochs_trainer_deterministic():
    lr, hr, valid = _stacks()
    state = create_gan_state(jax.random.key(0), CFG, 1e-4)
    s1, l1 = gan_train_epochs(state, lr, hr, valid, jax.random.key(2),
                              CFG, 1e-4, n_epochs=2)
    s2, l2 = gan_train_epochs(state, lr, hr, valid, jax.random.key(2),
                              CFG, 1e-4, n_epochs=2)
    np.testing.assert_array_equal(np.asarray(l1["losses_G"]),
                                  np.asarray(l2["losses_G"]))


def test_stack_dataset_wraps_to_batch_multiple(tmp_path):
    from PIL import Image

    from tpusr.data.div2k import GANDIV2KDataset

    hr_dir = tmp_path / "DIV2K_train_HR"
    lr_dir = tmp_path / "DIV2K_train_LR_x8"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    for name, (h, w) in [("0001", (256, 256)), ("0002", (256, 320)),
                         ("0003", (224, 256))]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(hr_dir / f"{name}.png")
        lr = np.asarray(Image.fromarray(img).resize((w // 8, h // 8),
                                                    Image.BICUBIC))
        Image.fromarray(lr).save(lr_dir / f"{name}x8.png")

    ds = GANDIV2KDataset(LR_dir=str(lr_dir), HR_dir=str(hr_dir),
                         scale_factor=8, train=True, LR_patch_size=(8, 8))
    lr_u8, hr_u8, valid = stack_dataset_for_device(ds, batch_size=2)
    assert lr_u8.shape[0] == 4  # 3 images wrapped to 4
    assert hr_u8.shape[1] == lr_u8.shape[1] * 8
    assert valid.shape == (4, 2)
    # wrapped entry equals the first
    np.testing.assert_array_equal(lr_u8[3], lr_u8[0])
    # valid dims describe the true (pre-pad) extents
    assert tuple(valid[0]) == (16, 16)
