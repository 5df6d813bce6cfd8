"""Convert torchvision VGG19 / lpips AlexNet checkpoints to tpusr npz files.

Run this on a machine WITH the pretrained .pth files (this build environment
has no network egress, so the files must be brought in):

    python tools/convert_torch_weights.py vgg19  vgg19-dcbb9e9d.pth  vgg19.npz
    python tools/convert_torch_weights.py lpips  alex.pth            lpips_alex.npz
    # torchmetrics' LPIPS uses the `lpips` package checkpoint layout:
    #   net.slice{1..5} AlexNet convs + lin{0..4}.model.1.weight heads

Then point the engines at them:

    export TPUSR_VGG19_WEIGHTS=/path/vgg19.npz
    export TPUSR_LPIPS_WEIGHTS=/path/lpips_alex.npz
"""

from __future__ import annotations

import sys

import numpy as np


def convert_vgg19(src: str, dst: str) -> None:
    import torch

    from tpusr.models.vgg19 import load_torch_vgg19_features, vgg19_layer_names

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k.removeprefix("features."): np.asarray(v) for k, v in sd.items()
          if k.startswith("features.") or "." not in k.split(".", 1)[0]}
    params = load_torch_vgg19_features(sd)
    out = {}
    for name in vgg19_layer_names():
        out[f"{name}.kernel"] = np.asarray(params[name]["kernel"])
        out[f"{name}.bias"] = np.asarray(params[name]["bias"])
    np.savez(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays)")


# AlexNet conv indices inside torchvision alexnet().features
_ALEX_FEATURE_IDX = {"conv1": 0, "conv2": 3, "conv3": 6, "conv4": 8, "conv5": 10}


def convert_lpips(src: str, dst: str) -> None:
    """Convert an `lpips` package AlexNet checkpoint (+ embedded backbone).

    Accepts either the full torchmetrics state_dict (with net.* backbone and
    lin{i}.model.1.weight heads) or the small lpips-only file combined with a
    torchvision alexnet features state_dict passed as ``src=a.pth,b.pth``.
    """
    import torch

    paths = src.split(",")
    sd: dict = {}
    for p in paths:
        sd.update(torch.load(p, map_location="cpu", weights_only=True))

    out = {}
    for name, ti in _ALEX_FEATURE_IDX.items():
        for cand in (f"net.slice{list(_ALEX_FEATURE_IDX).index(name) + 1}.{ti}",
                     f"net.{ti}", f"features.{ti}", f"{ti}"):
            wk, bk = f"{cand}.weight", f"{cand}.bias"
            if wk in sd:
                out[f"{name}.kernel"] = np.asarray(sd[wk]).transpose(2, 3, 1, 0)
                out[f"{name}.bias"] = np.asarray(sd[bk])
                break
        else:
            raise KeyError(f"could not locate AlexNet conv {name} in {paths}")
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in sd:
                out[f"lin{i}.kernel"] = np.asarray(sd[cand]).reshape(-1)
                break
        else:
            raise KeyError(f"could not locate LPIPS head lin{i} in {paths}")
    np.savez(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays)")


if __name__ == "__main__":
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if kind == "vgg19":
        convert_vgg19(src, dst)
    elif kind == "lpips":
        convert_lpips(src, dst)
    else:
        raise SystemExit(f"unknown kind {kind}")
