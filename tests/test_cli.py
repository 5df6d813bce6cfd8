"""End-to-end CLI smoke tests on synthetic DIV2K data (tiny configs).

These exercise the full L4->L0 stack: flag parsing, dataset, jitted engines,
image/log persistence — the reference's three entry points.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        hr_dir = root / f"DIV2K_{split}_HR"
        lr_dir = root / f"DIV2K_{split}_LR_x8"
        hr_dir.mkdir()
        lr_dir.mkdir()
        names = [f"{i:04d}" for i in range(1, 9)] if split == "train" else ["0001"]
        for name in names:
            h, w = 256, 256
            hr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            Image.fromarray(hr).save(hr_dir / f"{name}.png")
            lr = np.asarray(Image.fromarray(hr).resize((w // 8, h // 8),
                                                       Image.BICUBIC))
            Image.fromarray(lr).save(lr_dir / f"{name}x8.png")
    return str(root)


def test_dip_cli_end_to_end(data_dir, tmp_path, monkeypatch):
    from tpusr.cli import dip

    out_root = tmp_path / "out"
    out_root.mkdir()
    dip.run([
        "--data_dir", data_dir,
        "--out_dir", str(out_root),
        "--num_iter", "6",
        "--train_log_freq", "3",
        "--num_images", "1",
        "--save_output", "True",
        # tiny net so the CLI path runs fast on the CPU CI backend
        "--input_depth", "8", "--num_scales", "3",
        "--skip_n33d", "16", "--skip_n33u", "16",
    ])
    # out/DIPx8/<timestamp>/{images/*.png, *_log.txt}
    runs = list((out_root / "out" / "DIPx8").iterdir())
    assert len(runs) == 1
    files = os.listdir(runs[0] / "images")
    assert "0001_resolved.png" in files
    assert "0001_LR.png" in files
    assert "0001_HR.png" in files
    logs = [f for f in os.listdir(runs[0]) if f.endswith("_log.txt")]
    assert logs
    text = (runs[0] / logs[0]).read_text()
    assert "Average final PSNR" in text
    assert "runtime" in text


def test_train_and_eval_gan_cli_end_to_end(data_dir, tmp_path):
    from tpusr.cli import eval_gan, train_gan

    out_root = tmp_path / "trained"
    out_root.mkdir()

    train_dir = train_gan.run([
        "--data_dir", data_dir,
        "--out_dir", str(out_root),
        "--pre_train_epochs", "1",
        "--fine_tune_epochs", "1",
        "--train_log_freq", "1",
        "--num_images", "1",
        # tiny workload for the CPU CI backend
        "--hr_patch_size", "64", "--batch_size", "2", "--residual_blocks", "2",
    ])
    files = os.listdir(train_dir)
    assert "pre_trained_srgan_G.pth" in files
    assert "fine_tuned_srgan_G.pth" in files
    assert any(f.endswith("_log.txt") for f in files)
    assert any("state" in f for f in files)

    # discriminator .pth parity artifacts too (train_GAN.py:188)
    assert "pre_trained_srgan_D.pth" in files
    assert "fine_tuned_srgan_D.pth" in files

    eval_root = tmp_path / "evalout"
    eval_root.mkdir()
    metrics = eval_gan.run([
        "--data_dir", data_dir,
        "--out_dir", str(eval_root),
        "--model_path", os.path.join(train_dir, "fine_tuned_srgan_G.pth"),
        "--num_images", "1",
        "--save_images", "True",
        "--factor", "8",
        "--residual_blocks", "2",
    ])
    assert np.isfinite(metrics["avg_psnr"])
    runs = list((eval_root / "out" / "GANx8").iterdir())
    assert len(runs) == 1
    assert "0001.png" in os.listdir(runs[0] / "images")

    # orbax state dir also loads for eval
    metrics2 = eval_gan.run([
        "--data_dir", data_dir,
        "--out_dir", str(eval_root),
        "--model_path", os.path.join(train_dir, "fine_tuned_state"),
        "--num_images", "1",
        "--factor", "8",
        "--residual_blocks", "2",
    ])
    assert abs(metrics2["avg_psnr"] - metrics["avg_psnr"]) < 1e-3


def test_train_gan_cli_data_parallel(data_dir, tmp_path):
    """--data_parallel over the 8-device CPU mesh, end to end."""
    from tpusr.cli import train_gan

    out_root = tmp_path / "dp"
    out_root.mkdir()
    train_dir = train_gan.run([
        "--data_dir", data_dir,
        "--out_dir", str(out_root),
        "--pre_train_epochs", "1",
        "--fine_tune_epochs", "1",
        "--train_log_freq", "1",
        "--num_images", "8",
        "--hr_patch_size", "64", "--batch_size", "8", "--residual_blocks", "2",
        "--data_parallel", "True",
    ])
    files = os.listdir(train_dir)
    assert "fine_tuned_srgan_G.pth" in files
