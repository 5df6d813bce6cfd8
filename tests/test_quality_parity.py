"""Cross-framework DIP quality parity (statistical).

Bit-level parity across frameworks is impossible (different PRNGs), so this
checks that an independently implemented torch-CPU DIP loop with the same
architecture/workload reaches a final PSNR within a tolerance of tpusr's on
the same image. Small workload: factor x4, 64x64 HR, tiny skip net, 120 iters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from tpusr.engine.dip import DIPConfig, dip_superresolve
from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.ops.resample import Downsampler, get_kernel

FACTOR = 4
H = W = 64
ITERS = 120
CH = 24
SKIP = 4
SCALES = 3
DEPTH = 8

CFG = DIPConfig(factor=FACTOR, num_iter=ITERS, log_freq=ITERS,
                learning_rate=0.01, reg_noise_std=0.03, input_depth=DEPTH,
                skip_n33d=CH, skip_n33u=CH, skip_n11=SKIP, num_scales=SCALES)


def _image():
    yy, xx = np.mgrid[0:H, 0:W]
    hr = np.stack([
        0.5 + 0.4 * np.sin(xx / 6.0) * np.cos(yy / 5.0),
        0.5 + 0.35 * np.cos(xx / 9.0 + yy / 7.0),
        0.5 + 0.3 * np.sin((2 * xx - yy) / 11.0),
    ], axis=-1).astype(np.float32)[None]
    return np.clip(hr, 0, 1)


def _torch_dip_psnr(hr_np: np.ndarray, seed: int) -> float:
    """Independent torch implementation of the same DIP workload."""
    torch.manual_seed(seed)

    def block(cin, cout, k, stride=1):
        p = (k - 1) // 2
        mods = []
        if p:
            mods.append(nn.ReflectionPad2d(p))
        mods += [nn.Conv2d(cin, cout, k, stride), nn.BatchNorm2d(cout),
                 nn.LeakyReLU(0.2)]
        return mods

    class Level(nn.Module):
        def __init__(self, cin, inner):
            super().__init__()
            k = CH
            self.skip = nn.Sequential(nn.Conv2d(cin, SKIP, 1),
                                      nn.BatchNorm2d(SKIP), nn.LeakyReLU(0.2))
            self.down = nn.Sequential(*block(cin, CH, 3, 2), *block(CH, CH, 3))
            self.inner = inner
            self.post = nn.Sequential(
                nn.BatchNorm2d(SKIP + CH), *block(SKIP + CH, CH, 3),
                nn.Conv2d(CH, CH, 1), nn.BatchNorm2d(CH), nn.LeakyReLU(0.2))

        def forward(self, x):
            s = self.skip(x)
            d = self.down(x)
            if self.inner is not None:
                d = self.inner(d)
            d = nn.functional.interpolate(d, scale_factor=2, mode="bilinear",
                                          align_corners=False)
            d = d[:, :, :s.shape[2], :s.shape[3]]
            return self.post(torch.cat([s, d], 1))

    inner = None
    for i in range(SCALES):
        inner = Level(DEPTH if i == SCALES - 1 else CH, inner)
    net = nn.Sequential(inner, nn.Conv2d(CH, 3, 1), nn.Sigmoid())

    k2d = get_kernel(FACTOR, "lanczos", 0.5, 4 * FACTOR + 1, support=2)
    kt = torch.from_numpy(k2d).float()
    dw = torch.zeros(3, 1, *k2d.shape)
    for i in range(3):
        dw[i, 0] = kt
    pad = (k2d.shape[0] - FACTOR) // 2

    hr_t = torch.from_numpy(hr_np.transpose(0, 3, 1, 2))
    with torch.no_grad():
        padded = nn.functional.pad(hr_t, (pad,) * 4, mode="replicate")
        lr_t = nn.functional.conv2d(padded, dw, stride=FACTOR, groups=3)

    z = torch.rand(1, DEPTH, H, W) * 0.1
    opt = torch.optim.Adam(net.parameters(), lr=0.01)
    mse = nn.MSELoss()
    for _ in range(ITERS):
        opt.zero_grad()
        out = net(z + torch.randn_like(z) * CFG.reg_noise_std)
        padded = nn.functional.pad(out, (pad,) * 4, mode="replicate")
        out_lr = nn.functional.conv2d(padded, dw, stride=FACTOR, groups=3)
        loss = mse(out_lr, lr_t)
        loss.backward()
        opt.step()

    with torch.no_grad():
        final = net(z)
    mse_v = float(((final - hr_t) ** 2).mean())
    return 10 * np.log10(1.0 / mse_v)


@pytest.mark.slow
def test_dip_quality_matches_torch_reference_loop():
    hr = _image()
    lr = Downsampler(3, FACTOR, "lanczos2", phase=0.5, preserve_size=True)(
        jnp.asarray(hr))

    ours = []
    for seed in (0, 1):
        resolved, _ = dip_superresolve(jnp.asarray(lr), jnp.asarray(hr),
                                       jax.random.key(seed), CFG)
        ours.append(float(psnr_fn(resolved, jnp.asarray(hr), data_range=1.0)))

    theirs = [_torch_dip_psnr(hr, seed) for seed in (0, 1)]

    ours_m, theirs_m = np.mean(ours), np.mean(theirs)
    # both must actually reconstruct, and land in the same quality regime.
    # Measured over 4 seeds each: tpusr 30.45 +/- 0.43 dB, torch oracle
    # 30.97 +/- 0.65 dB — a 0.5 dB gap inside seed noise.
    assert ours_m > 25, f"tpusr DIP underperforms: {ours}"
    assert theirs_m > 25, f"torch oracle underperforms: {theirs}"
    assert abs(ours_m - theirs_m) < 1.8, (ours, theirs)
