"""Pillow-compatible bicubic resize as dense weight-matrix contractions.

The reference dataset pipeline leans on ``PIL.Image.resize(..., BICUBIC)``
(utils/degradation.py:19-20, dataset.py:21-46) executed per sample on the
host CPU. Here the same resampling is expressed TPU-natively: the separable
row/column filter banks are precomputed as dense (out, in) matrices on the
host, and the resize itself is two matmuls — work the MXU is built for, and
trivially batchable/vmappable.

Numerics: Pillow's "cubic" filter is the Keys kernel with a = -0.5 and
support 2.0, with support scaled by the reduction factor when downscaling
(antialiasing). Pillow's uint8 path accumulates in fixed point; we compute in
float32, so results can differ from Pillow by ±1 LSB after quantization.
Golden tests bound that difference (tests/test_bicubic.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_A = -0.5  # Keys cubic coefficient used by Pillow's BICUBIC filter
_SUPPORT = 2.0


def _cubic_filter(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    return np.where(
        x < 1.0,
        (_A + 2.0) * x3 - (_A + 3.0) * x2 + 1.0,
        np.where(x < 2.0, _A * (x3 - 5.0 * x2 + 8.0 * x - 4.0), 0.0),
    )


def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) bicubic resampling matrix, PIL semantics.

    Matches Pillow's precompute_coeffs: half-pixel centers, filter support
    scaled by max(in/out, 1), weights normalized to sum 1, taps clamped to
    the image edges (accumulated into the border sample).
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = _SUPPORT * filterscale

    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale
    xmin = np.maximum(0, np.floor(centers - support).astype(np.int64))
    xmax = np.minimum(in_size, np.ceil(centers + support).astype(np.int64))

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        taps = np.arange(xmin[i], xmax[i], dtype=np.float64)
        w = _cubic_filter((taps + 0.5 - centers[i]) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        mat[i, xmin[i]:xmax[i]] = w
    return mat  # float64; callers cast (quantization needs full precision)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize NHWC (or HWC) float array with PIL-BICUBIC semantics.

    Values are *not* clipped or quantized; callers at the uint8 boundary
    should clip to [0, 255] and round like Pillow does.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    mh = jnp.asarray(resize_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(resize_matrix(w, out_w), dtype=x.dtype)
    # rows: (out_h, h) x (n, h, w, c) over h ; cols: (out_w, w) over w
    y = jnp.einsum("oh,nhwc->nowc", mh, x)
    y = jnp.einsum("pw,nowc->nopc", mw, y)
    if squeeze:
        y = y[0]
    return y


def pil_downsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Integer-factor shrink matching ``utils/degradation.py:19-20``:
    new size = floor(size / factor)."""
    if x.ndim == 3:
        h, w = x.shape[0], x.shape[1]
    else:
        h, w = x.shape[1], x.shape[2]
    return resize_bicubic(x, h // factor, w // factor)


# ---------------------------------------------------------------------------
# Bit-exact Pillow uint8 emulation
# ---------------------------------------------------------------------------
# Pillow's 8-bit resample quantizes the normalized filter weights to
# round(w * 2^22) int32 coefficients, accumulates k*v in int32, and emits
# clip8((acc + 2^21) >> 22), running the horizontal pass first with a uint8
# intermediate image. Reproducing that integer pipeline gives byte-identical
# output to PIL.Image.resize(..., BICUBIC) — the dataset-prep operator of the
# reference — while staying a dense matmul (int32 on the VPU).

_PRECISION_BITS = 32 - 8 - 2  # 22


def resize_matrix_u8(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) int32 coefficient matrix matching Pillow's quantization."""
    m = resize_matrix(in_size, out_size)
    scale = float(1 << _PRECISION_BITS)
    q = np.where(m < 0, m * scale - 0.5, m * scale + 0.5)
    return q.astype(np.int32)


def _pass_u8(x_i32: jnp.ndarray, coeffs: np.ndarray, axis: int) -> jnp.ndarray:
    """One fixed-point resample pass along H (axis=-3) or W (axis=-2)."""
    k = jnp.asarray(coeffs)  # (out, in)
    if axis == -3:
        acc = jnp.einsum("oh,...hwc->...owc", k, x_i32)
    else:
        acc = jnp.einsum("ow,...hwc->...hoc", k, x_i32)
    acc = (acc + (1 << (_PRECISION_BITS - 1))) >> _PRECISION_BITS
    return jnp.clip(acc, 0, 255)


def resize_bicubic_u8(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Byte-exact PIL BICUBIC resize of a uint8 HWC / NHWC image.

    Returns int32 values in [0, 255]. Horizontal pass first, uint8
    intermediate — exactly Pillow's two-pass order.
    """
    x = x.astype(jnp.int32)
    h, w = x.shape[-3], x.shape[-2]
    if w != out_w:
        x = _pass_u8(x, resize_matrix_u8(w, out_w), axis=-2)
    if h != out_h:
        x = _pass_u8(x, resize_matrix_u8(h, out_h), axis=-3)
    return x
