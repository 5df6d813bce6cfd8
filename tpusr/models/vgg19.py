"""VGG19 feature extractor for the SRGAN perceptual (content) loss.

Capability parity with ``utils/GAN.py:7-92`` (Vgg19Loss): features through
ReLU5_4 (the phi_{5,4} map of the SRGAN paper — torchvision ``features[:36]``),
preceded by the torchvision ImageNet eval transform (resize 256 / center-crop
224 / normalize), applied to BOTH images, then MSE of the feature maps.

This image has no network egress and no torchvision, so pretrained weights
cannot be downloaded here. The module therefore:
  * defines the exact conv topology with torch-compatible naming so a
    ``vgg19`` torchvision state_dict (.pth) converts 1:1 via
    ``load_torch_vgg19_features``;
  * falls back to None (callers then use plain MSE content loss — flagged in
    logs) when no weights file is available.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpusr.ops.bicubic import resize_bicubic

# (out_channels, n_convs) per block; maxpool after each block.
_VGG19_BLOCKS = [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Environment hook for a converted weights file (npz of HWIO kernels+biases).
VGG19_WEIGHTS_ENV = "TPUSR_VGG19_WEIGHTS"


def vgg19_layer_names() -> list[str]:
    """Conv layer names 'conv{block}_{idx}' in forward order (16 convs)."""
    names = []
    for b, (_, n) in enumerate(_VGG19_BLOCKS, start=1):
        for i in range(1, n + 1):
            names.append(f"conv{b}_{i}")
    return names


def vgg_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """torchvision VGG19 eval transform over NHWC (values nominally [0,1]).

    Exact tensor-path semantics of torchvision's ImageClassification preset
    (the reference applies it to both loss inputs, utils/GAN.py:82-83):
      * resize shorter side to 256, long side = int(256 * long / short)
        (torchvision truncates, not rounds), ANTIALIASED bilinear — verified
        to match torch.nn.functional.interpolate(antialias=True) to ~3e-7
        (tests/test_perceptual_oracle.py);
      * center-crop 224 with torchvision's int(round((size-224)/2)) offsets;
      * normalize with ImageNet stats (no [0,1] rescale for float tensors —
        convert_image_dtype is a no-op on floats, so the reference's [-1,1]
        fine-tune tensors pass through unchanged; quirk reproduced).

    jax.image.resize(antialias=True) lowers to per-axis weight matmuls
    (scale_and_translate), not gathers — MXU-friendly in the per-step loss.
    """
    import jax

    n, h, w, c = x.shape
    if h <= w:
        nh, nw = 256, max(224, int(256 * w / h))
    else:
        nh, nw = max(224, int(256 * h / w)), 256
    x = jax.image.resize(x, (n, nh, nw, c), method="linear", antialias=True)
    top = int(round((nh - 224) / 2.0))
    left = int(round((nw - 224) / 2.0))
    x = x[:, top:top + 224, left:left + 224, :]
    mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(_IMAGENET_STD, x.dtype)
    return (x - mean) / std


def vgg19_features(params: dict[str, Any], x: jnp.ndarray, upto: str = "conv5_4") -> jnp.ndarray:
    """Run VGG19 conv stack (ReLU after every conv, 2x2 maxpool between
    blocks) and return the activation after ``upto``'s ReLU.

    ``upto='conv5_4'`` reproduces torchvision features[:36] (utils/GAN.py:72).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    for b, (_, n_convs) in enumerate(_VGG19_BLOCKS, start=1):
        for i in range(1, n_convs + 1):
            name = f"conv{b}_{i}"
            w = params[name]["kernel"].astype(x.dtype)
            bias = params[name]["bias"].astype(x.dtype)
            x = lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + bias
            x = jnp.maximum(x, 0.0)
            if name == upto:
                return x
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    raise ValueError(f"unknown layer {upto!r}")


def load_vgg19_npz(path: str) -> dict[str, Any]:
    """Load converted VGG19 weights (see tools/convert_torch_weights.py)."""
    data = np.load(path)
    params: dict[str, Any] = {}
    for name in vgg19_layer_names():
        params[name] = {
            "kernel": jnp.asarray(data[f"{name}.kernel"]),
            "bias": jnp.asarray(data[f"{name}.bias"]),
        }
    return params


def load_torch_vgg19_features(state_dict: dict) -> dict[str, Any]:
    """Convert a torchvision vgg19().features state_dict to our params.

    torchvision indexes convs as features.{0,2,5,7,10,...}.weight (OIHW);
    we map them positionally onto conv{b}_{i} and transpose to HWIO.
    """
    conv_indices = []
    idx = 0
    for _, n_convs in _VGG19_BLOCKS:
        for _ in range(n_convs):
            conv_indices.append(idx)
            idx += 2  # conv + relu
        idx += 1  # maxpool
    params: dict[str, Any] = {}
    for name, ti in zip(vgg19_layer_names(), conv_indices):
        w = np.asarray(state_dict[f"{ti}.weight"])
        b = np.asarray(state_dict[f"{ti}.bias"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return params


def try_load_vgg19() -> dict[str, Any] | None:
    """Load VGG19 feature weights from $TPUSR_VGG19_WEIGHTS if present."""
    path = os.environ.get(VGG19_WEIGHTS_ENV, "")
    if path and os.path.exists(path):
        if path.endswith(".npz"):
            return load_vgg19_npz(path)
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k.removeprefix("features."): v for k, v in sd.items()}
        return load_torch_vgg19_features(sd)
    return None
