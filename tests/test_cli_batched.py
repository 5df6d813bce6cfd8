"""DIP CLI with --bucket and --batch_images over a mixed-shape dataset."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def mixed_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mixed")
    hr_dir = root / "DIV2K_train_HR"
    lr_dir = root / "DIV2K_train_LR_x8"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    # three images, two distinct shapes -> one full group + one partial group
    for name, (h, w) in [("0001", (128, 128)), ("0002", (130, 126)),
                         ("0003", (192, 128))]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(hr_dir / f"{name}.png")
        lr = np.asarray(Image.fromarray(img).resize((w // 8, h // 8),
                                                    Image.BICUBIC))
        Image.fromarray(lr).save(lr_dir / f"{name}x8.png")
    return str(root)


def test_dip_cli_bucketed_batched(mixed_data, tmp_path):
    from tpusr.cli import dip

    out_root = tmp_path / "out"
    out_root.mkdir()
    metrics = dip.run([
        "--data_dir", mixed_data,
        "--out_dir", str(out_root),
        "--num_iter", "6",
        "--train_log_freq", "3",
        "--num_images", "3",
        "--save_output", "True",
        "--bucket", "32",
        "--batch_images", "2",
        "--input_depth", "8", "--num_scales", "3",
        "--skip_n33d", "16", "--skip_n33u", "16",
    ])
    runs = list((out_root / "out" / "DIPx8").iterdir())
    files = os.listdir(runs[0] / "images")
    for name in ("0001", "0002", "0003"):
        assert f"{name}_resolved.png" in files
    # resolved image must match the TRUE (uncropped-bucket) HR size
    a = np.array(Image.open(runs[0] / "images" / "0002_resolved.png"))
    # 130x126 HR -> dataset /2 -> 65x63 -> snapped to factor multiple 8x(8,7)=64,56
    assert a.shape[0] % 8 == 0 and a.shape[1] % 8 == 0
    b = np.array(Image.open(runs[0] / "images" / "0002_HR.png"))
    assert a.shape == b.shape
