"""Layout/domain converters (parity: utils/common.py:62-102, NHWC-centric).

The torch world is NCHW; tpusr is NHWC on device. These helpers live at the
boundary only — nothing inside the jitted paths transposes layouts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hwc_to_chw(x: np.ndarray) -> np.ndarray:
    return np.moveaxis(np.asarray(x), -1, -3)


def chw_to_hwc(x: np.ndarray) -> np.ndarray:
    return np.moveaxis(np.asarray(x), -3, -1)


def np_to_device(x: np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Host HWC/NHWC array -> device array (adds batch dim if absent).

    dtype=None keeps the input dtype (e.g. uint8 payloads that engines
    normalize on device — 4x less host->device traffic)."""
    arr = jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype)
    if arr.ndim == 3:
        arr = arr[None]
    return arr


def device_to_np(x: jnp.ndarray) -> np.ndarray:
    """Device NHWC -> host HWC (drops the leading batch dim if singleton)."""
    arr = np.asarray(x)
    if arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    return arr
