"""Generate SEEDED random-init surrogate VGG19 / LPIPS weight files.

This environment has no egress, so the real pretrained weights are
unobtainable; the graphs are oracle-proven against torch
(tests/test_perceptual_oracle.py) but had never been exercised end-to-end
on hardware. These surrogates make the full perceptual train/eval paths
runnable — compile behavior, step cost, and finite metrics — leaving the
WEIGHT VALUES as the only untested element. Kaiming-style fan-in scaling
keeps activations in a sane range so losses stay finite.

Usage:
    python tools/make_surrogate_weights.py /tmp/sur_vgg19.npz /tmp/sur_lpips.npz
    TPUSR_VGG19_WEIGHTS=/tmp/sur_vgg19.npz TPUSR_LPIPS_WEIGHTS=/tmp/sur_lpips.npz \
        python -m tpusr.cli.train_gan ...
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tpusr.models.lpips import _ALEX_CONVS  # noqa: E402
from tpusr.models.vgg19 import _VGG19_BLOCKS, vgg19_layer_names  # noqa: E402


def make_vgg19(path: str, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    out = {}
    cin = 3
    widths = []
    for width, n in _VGG19_BLOCKS:
        widths += [width] * n
    for name, cout in zip(vgg19_layer_names(), widths):
        fan_in = 9 * cin
        out[f"{name}.kernel"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), (3, 3, cin, cout)).astype(np.float32)
        out[f"{name}.bias"] = np.zeros((cout,), np.float32)
        cin = cout
    np.savez(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


def make_lpips(path: str, seed: int = 1) -> None:
    rng = np.random.default_rng(seed)
    out = {}
    cin = 3
    for name, cout, k, _, _ in _ALEX_CONVS:
        fan_in = k * k * cin
        out[f"{name}.kernel"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), (k, k, cin, cout)).astype(np.float32)
        out[f"{name}.bias"] = np.zeros((cout,), np.float32)
        cin = cout
    for i, (_, cout, *_rest) in enumerate(_ALEX_CONVS):
        # nonneg 1x1 lin weights, as in the lpips package
        out[f"lin{i}.kernel"] = rng.uniform(
            0, 2.0 / cout, (cout,)).astype(np.float32)
    np.savez(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    vgg_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sur_vgg19.npz"
    lpips_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sur_lpips.npz"
    make_vgg19(vgg_path)
    make_lpips(lpips_path)
