"""End-to-end numerical parity: torch SRGAN forward == tpusr forward.

A torch transcription of the reference topology (models/GAN/generator.py,
models/GAN/discriminator.py) is built here as the oracle; its random weights
are imported through io/checkpoint and both frameworks run the same input.
This validates the model math AND the .pth import path in one shot.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from tpusr.engine.gan import GANTrainConfig, generator_forward
from tpusr.io.checkpoint import (
    export_torch_generator,
    import_torch_discriminator,
    import_torch_generator,
)
from tpusr.models.srgan import Discriminator


class TorchResBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(64, 64, 3, 1, 1)
        self.bn1 = nn.BatchNorm2d(64)
        self.prelu1 = nn.PReLU()
        self.conv2 = nn.Conv2d(64, 64, 3, 1, 1)
        self.bn2 = nn.BatchNorm2d(64)

    def forward(self, x):
        z = self.prelu1(self.bn1(self.conv1(x)))
        z = self.bn2(self.conv2(z))
        return x + z


class TorchPSBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(64, 256, 3, 1, 1)
        self.shuffler1 = nn.PixelShuffle(2)
        self.prelu1 = nn.PReLU()

    def forward(self, x):
        return self.prelu1(self.shuffler1(self.conv1(x)))


class TorchGenerator(nn.Module):
    def __init__(self, n_res=4, n_ps=2):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 9, 1, 4)
        self.prelu1 = nn.PReLU()
        self.residual_blocks = nn.Sequential(*[TorchResBlock() for _ in range(n_res)])
        self.conv2 = nn.Conv2d(64, 64, 3, 1, 1)
        self.bn1 = nn.BatchNorm2d(64)
        self.pixel_shuffle_blocks = nn.Sequential(*[TorchPSBlock() for _ in range(n_ps)])
        self.conv3 = nn.Conv2d(64, 3, 9, 1, 4)

    def forward(self, x):
        x0 = self.prelu1(self.conv1(x))
        z = self.residual_blocks(x0)
        z = x0 + self.bn1(self.conv2(z))
        z = self.pixel_shuffle_blocks(z)
        return torch.tanh(self.conv3(z))


class TorchDiscriminator(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 64, 3, 1, 1)
        blocks = []
        schedule = [(64, 64, 2), (64, 128, 1), (128, 128, 2), (128, 256, 1),
                    (256, 256, 2), (256, 512, 1), (512, 512, 2)]
        for cin, cout, s in schedule:
            m = nn.Module()
            m.conv1 = nn.Conv2d(cin, cout, 3, s, 1)
            m.bn1 = nn.BatchNorm2d(cout)
            blocks.append(m)
        self.convblocks = nn.ModuleList(blocks)
        self.dense1 = nn.Linear(512 * 2 * 2, 1024)
        self.dense2 = nn.Linear(1024, 1)

    def forward(self, x):
        x = nn.functional.leaky_relu(self.conv(x), 0.2)
        for b in self.convblocks:
            x = nn.functional.leaky_relu(b.bn1(b.conv1(x)), 0.2)
        x = x.reshape(x.size(0), -1)
        x = nn.functional.leaky_relu(self.dense1(x), 0.2)
        return self.dense2(x)  # logits


def test_generator_forward_parity_via_pth_import():
    torch.manual_seed(0)
    tg = TorchGenerator(n_res=4, n_ps=2).eval()
    sd = {k: np.asarray(v.detach()) for k, v in tg.state_dict().items()}
    params, stats = import_torch_generator(sd, residual_blocks_count=4, n_shuffles=2)

    x = np.random.default_rng(0).random((2, 10, 14, 3)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    cfg = GANTrainConfig(factor=4, residual_blocks_count=4)
    got = generator_forward(params, stats, jnp.asarray(x), cfg, train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_infer_generator_arch_torch_and_params():
    """eval_gan must adapt to the block counts a checkpoint actually holds
    (a train --residual_blocks 2 run's .pth evaluated without the flag
    KeyError'd before the inference existed)."""
    from tpusr.io.checkpoint import infer_generator_arch

    torch.manual_seed(3)
    tg = TorchGenerator(n_res=2, n_ps=3)
    sd = {k: np.asarray(v.detach()) for k, v in tg.state_dict().items()}
    assert infer_generator_arch(sd) == (2, 3)
    params, _ = import_torch_generator(sd, residual_blocks_count=2,
                                       n_shuffles=3)
    assert infer_generator_arch(params) == (2, 3)


def test_load_generator_adapts_and_rejects():
    """load_generator corrects a residual-block mismatch (warn + override)
    and raises on a shuffle/factor mismatch with the required factor."""
    import dataclasses
    import warnings

    import pytest

    from tpusr.cli.eval_gan import load_generator

    torch.manual_seed(4)
    tg = TorchGenerator(n_res=2, n_ps=3)  # an x8 generator, 2 res blocks
    sd = {k: v.detach() for k, v in tg.state_dict().items()}
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/g.pth"
        torch.save(sd, path)
        cfg = GANTrainConfig(factor=8, residual_blocks_count=16)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _, _, cfg2 = load_generator(path, cfg)
        assert cfg2.residual_blocks_count == 2
        assert any("residual blocks" in str(x.message) for x in w)

        cfg16 = dataclasses.replace(cfg, factor=16)
        with pytest.raises(ValueError, match="x8"):
            load_generator(path, cfg16)


def test_generator_export_roundtrip():
    torch.manual_seed(1)
    tg = TorchGenerator(n_res=2, n_ps=1).eval()
    sd = {k: np.asarray(v.detach()) for k, v in tg.state_dict().items()}
    params, stats = import_torch_generator(sd, residual_blocks_count=2, n_shuffles=1)
    back = export_torch_generator(params, stats, residual_blocks_count=2, n_shuffles=1)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(back[k], v, atol=1e-7, err_msg=k)


def test_discriminator_forward_parity_via_pth_import():
    torch.manual_seed(2)
    td = TorchDiscriminator().eval()  # 32x32 patches -> 2x2x512 features
    sd = {k: np.asarray(v.detach()) for k, v in td.state_dict().items()}
    # rename convblocks.{i}.* to the reference's Sequential naming
    sd = {k.replace("convblocks.", "convblocks."): v for k, v in sd.items()}
    params, stats = import_torch_discriminator(sd, hr_patch=32)

    x = np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    d = Discriminator()
    got = d.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)
