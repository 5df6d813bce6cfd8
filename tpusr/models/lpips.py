"""LPIPS (AlexNet variant) — learned perceptual metric.

The reference consumes torchmetrics' LPIPS(net_type='alex') (DIP.py:159,
train_GAN.py:32, eval_GAN.py:32), which wraps the lpips package: AlexNet
features at the 5 ReLU stages, per-channel unit normalization, learned 1x1
linear heads, spatial mean, sum over stages.

This environment has no egress, so the pretrained AlexNet + linear weights
cannot be fetched. The full computation graph is implemented here with a
weight-loading hook (``TPUSR_LPIPS_WEIGHTS`` -> npz produced by
tools/convert_torch_weights.py from a torchmetrics/lpips checkpoint). When no
weights are available ``make_lpips()`` returns None and the engines log LPIPS
as NaN — a documented divergence, not a silent wrong number.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import jax.numpy as jnp
from jax import lax

LPIPS_WEIGHTS_ENV = "TPUSR_LPIPS_WEIGHTS"

# AlexNet feature stack: (name, out_ch, kernel, stride, pad); maxpool(3,2)
# after stages 1, 2, and 5. ReLU taps feed the LPIPS heads.
_ALEX_CONVS = [
    ("conv1", 64, 11, 4, 2),
    ("conv2", 192, 5, 1, 2),
    ("conv3", 384, 3, 1, 1),
    ("conv4", 256, 3, 1, 1),
    ("conv5", 256, 3, 1, 1),
]
_POOL_AFTER = {"conv1", "conv2"}

# LPIPS input scaling layer constants (from the lpips package).
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def _conv(x, w, b, stride, pad):
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn)
    return y + b.astype(x.dtype)


def _maxpool32(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def alexnet_taps(params: dict[str, Any], x: jnp.ndarray) -> list[jnp.ndarray]:
    """The 5 post-ReLU feature maps used by LPIPS."""
    taps = []
    for name, _, _, stride, pad in _ALEX_CONVS:
        x = _conv(x, params[name]["kernel"], params[name]["bias"], stride, pad)
        x = jnp.maximum(x, 0.0)
        taps.append(x)
        if name in _POOL_AFTER:
            x = _maxpool32(x)
    return taps


def lpips_distance(params: dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LPIPS(x, y) for NHWC images in [-1, 1] (lpips package convention:
    torchmetrics rescales [0,1] inputs with normalize=True; the reference
    passes [-1,1]/arbitrary tensors through unchanged)."""
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    xs = (x - shift) / scale
    ys = (y - shift) / scale
    total = jnp.zeros((x.shape[0],), x.dtype)
    for i, (fx, fy) in enumerate(zip(alexnet_taps(params, xs), alexnet_taps(params, ys))):
        # lpips.normalize_tensor: feat / (||feat||_C + eps)  — eps OUTSIDE
        # the sqrt (oracle-matched in tests/test_perceptual_oracle.py)
        nx = fx / (jnp.sqrt(jnp.sum(fx * fx, axis=-1, keepdims=True)) + 1e-10)
        ny = fy / (jnp.sqrt(jnp.sum(fy * fy, axis=-1, keepdims=True)) + 1e-10)
        d = (nx - ny) ** 2
        lin = params[f"lin{i}"]["kernel"]  # (C,) nonneg 1x1 weights
        total = total + jnp.mean(jnp.sum(d * lin.astype(x.dtype), axis=-1), axis=(1, 2))
    return jnp.mean(total)


def load_lpips_npz(path: str) -> dict[str, Any]:
    data = np.load(path)
    params: dict[str, Any] = {}
    for name, *_ in _ALEX_CONVS:
        params[name] = {
            "kernel": jnp.asarray(data[f"{name}.kernel"]),
            "bias": jnp.asarray(data[f"{name}.bias"]),
        }
    for i in range(5):
        params[f"lin{i}"] = {"kernel": jnp.asarray(data[f"lin{i}.kernel"])}
    return params


def make_lpips() -> Callable | None:
    """Return lpips(x, y) closure if weights are available, else None."""
    path = os.environ.get(LPIPS_WEIGHTS_ENV, "")
    if path and os.path.exists(path):
        params = load_lpips_npz(path)
        return lambda x, y: lpips_distance(params, x, y)
    return None
