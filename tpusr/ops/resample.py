"""Antialiased strided downsampling — the DIP forward model.

Capability parity with the reference ``utils/downsampler.py`` (Downsampler
nn.Module at utils/downsampler.py:5-71, kernel generator at :73-135), built
TPU-first:

  * NHWC layout (TPU conv-native), depthwise convolution.
  * Separable execution: the lanczos/gauss/box kernel families are exact
    rank-1 outer products of a 1-D tap vector, so the 2-D (4f+1)^2 depthwise
    conv is run as two 1-D passes — O(k) instead of O(k^2) work per output
    pixel, which XLA maps far better onto the VPU/MXU.
  * Kernels are built once in NumPy at trace time (static shapes) and baked
    into the jitted graph as constants.

The kernel *formulas* reproduce the reference generator exactly (golden tests
in tests/test_resample.py check elementwise agreement with an independent
re-derivation), including its quirks:
  - gauss: center=(w+1)/2 and distances halved (utils/downsampler.py:91-100);
  - lanczos phase=0.5: taps at |i+0.5-center|/factor (:108-110);
  - phase=0.5 non-box kernels are (w-1)x(w-1) (:77-78);
  - kernel normalized to sum 1 (:133).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Kernel construction (NumPy, host side, trace-time constant)
# ---------------------------------------------------------------------------

def _lanczos_1d(taps: np.ndarray, support: float) -> np.ndarray:
    """Windowed-sinc value at distances ``taps`` (in units of the factor)."""
    t = np.abs(taps).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        val = (
            support
            * np.sin(np.pi * t)
            * np.sin(np.pi * t / support)
            / (np.pi * np.pi * t * t)
        )
    return np.where(t == 0.0, 1.0, val)


def get_kernel_1d(
    factor: int,
    kernel_type: str,
    phase: float,
    kernel_width: int,
    support: float | None = None,
    sigma: float | None = None,
) -> np.ndarray:
    """1-D tap vector whose outer product (normalized) is the 2-D kernel.

    Mirrors the per-axis factor of the separable closed forms in the
    reference generator (utils/downsampler.py:87-127).
    """
    if phase == 0.5 and kernel_type != "box":
        size = kernel_width - 1
    else:
        size = kernel_width

    if kernel_type == "box":
        if phase != 0.5:
            raise ValueError("box filter is always half-phased")
        return np.full(size, 1.0 / size, dtype=np.float64)

    idx = np.arange(1, size + 1, dtype=np.float64)
    center = (kernel_width + 1.0) / 2.0

    if kernel_type == "gauss":
        if sigma is None:
            raise ValueError("sigma is not specified")
        if phase == 0.5:
            raise ValueError("phase 1/2 for gauss not implemented")
        # Distances are halved and the 1/(2 pi sigma^2) prefactor applied on
        # one axis only — both quirks preserved from the reference closed form.
        d = (idx - center) / 2.0
        sigma_sq = sigma * sigma
        k = np.exp(-(d * d) / (2.0 * sigma_sq))
        return k / np.sqrt(2.0 * np.pi * sigma_sq)

    if kernel_type == "lanczos":
        if support is None:
            raise ValueError("support is not specified")
        if phase == 0.5:
            d = np.abs(idx + 0.5 - center) / factor
        else:
            d = np.abs(idx - center) / factor
        return _lanczos_1d(d, float(support))

    raise ValueError(f"wrong kernel type {kernel_type!r}")


def get_kernel(
    factor: int,
    kernel_type: str,
    phase: float,
    kernel_width: int,
    support: float | None = None,
    sigma: float | None = None,
) -> np.ndarray:
    """2-D resampling kernel, normalized to sum 1.

    Same contract as the reference ``get_kernel`` (utils/downsampler.py:73-135)
    but built as a separable outer product (the closed forms are rank-1).
    """
    k1 = get_kernel_1d(factor, kernel_type, phase, kernel_width, support, sigma)
    k2d = np.outer(k1, k1)
    return k2d / k2d.sum()


_KERNEL_PRESETS = {
    # name -> (resolved_type, support, kernel_width_fn, sigma)
    "lanczos2": ("lanczos", 2, lambda f: 4 * f + 1, None),
    "lanczos3": ("lanczos", 3, lambda f: 6 * f + 1, None),
    "gauss12": ("gauss", None, lambda f: 7, 0.5),
    "gauss1sq2": ("gauss", None, lambda f: 9, 1.0 / np.sqrt(2.0)),
}


def resolve_kernel_spec(
    factor: int,
    kernel_type: str,
    kernel_width: int | None = None,
    support: float | None = None,
    sigma: float | None = None,
):
    """Resolve the named presets of the reference (utils/downsampler.py:14-38)."""
    if kernel_type in _KERNEL_PRESETS:
        ktype, support, width_fn, sigma = _KERNEL_PRESETS[kernel_type]
        return ktype, width_fn(factor), support, sigma
    if kernel_type in ("lanczos", "gauss", "box"):
        if kernel_width is None:
            raise ValueError("kernel_width required for generic kernel types")
        return kernel_type, kernel_width, support, sigma
    raise ValueError(f"wrong name kernel {kernel_type!r}")


# ---------------------------------------------------------------------------
# Downsampling op (JAX, NHWC, depthwise separable)
# ---------------------------------------------------------------------------

def _depthwise_conv_1d(x: jnp.ndarray, taps: jnp.ndarray, axis: int, stride: int) -> jnp.ndarray:
    """Depthwise 1-D valid conv along H (axis=1) or W (axis=2) of NHWC ``x``."""
    c = x.shape[-1]
    k = taps.shape[0]
    if axis == 1:
        w = jnp.tile(taps.reshape(k, 1, 1, 1), (1, 1, 1, c))
        strides = (stride, 1)
    else:
        w = jnp.tile(taps.reshape(1, k, 1, 1), (1, 1, 1, c))
        strides = (1, stride)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class Downsampler:
    """Functional antialiased downsampler (parity: utils/downsampler.py:5-71).

    Unlike the reference this is not a stateful module: it precomputes the
    static kernel and exposes a pure ``__call__`` over NHWC arrays, safe to
    close over inside ``jit`` / ``scan`` / ``vmap``.

    ``preserve_size=True`` prepends replication (edge) padding sized so the
    output is exactly input/factor (reference :54-63).
    """

    def __init__(
        self,
        n_planes: int,
        factor: int,
        kernel_type: str,
        phase: float = 0,
        kernel_width: int | None = None,
        support: float | None = None,
        sigma: float | None = None,
        preserve_size: bool = False,
    ):
        if phase not in (0, 0.5):
            raise ValueError("phase should be 0 or 0.5")
        ktype, kwidth, ksupport, ksigma = resolve_kernel_spec(
            factor, kernel_type, kernel_width, support, sigma
        )
        self.factor = int(factor)
        self.n_planes = int(n_planes)
        self.kernel = get_kernel(factor, ktype, phase, kwidth, ksupport, ksigma)
        # Separable taps: kernel == outer(t, t) / s with s = (sum t)^2, so the
        # normalized 1-D pass vector is t / sum(t).
        t = get_kernel_1d(factor, ktype, phase, kwidth, ksupport, ksigma)
        self.taps = (t / t.sum()).astype(np.float32)

        ksize = self.kernel.shape[0]
        if preserve_size:
            if ksize % 2 == 1:
                self.pad = (ksize - 1) // 2
            else:
                self.pad = (ksize - self.factor) // 2
        else:
            self.pad = 0
        self.preserve_size = preserve_size

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, H, W, C) -> (N, H', W', C)."""
        return _downsample_sep(x, tuple(float(t) for t in self.taps),
                               self.factor, self.pad)

    def conv2d_with(self, x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
        """Depthwise 2-D conv with an EXPLICIT kernel — the opt_over='down'
        path (utils/DIP.py:50-57 adds the reference downsampler's conv weight
        to the optimized set; here the full 2-D kernel is the trainable leaf,
        so gradients are unconstrained exactly like the reference — the
        separable fast path only applies while the kernel stays rank-1).

        Equals ``__call__`` to float tolerance when ``kernel2d == outer(taps,
        taps)`` (tested in tests/test_dip_variants.py)."""
        if self.preserve_size and self.pad > 0:
            p = self.pad
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        c = x.shape[-1]
        k = kernel2d.shape[0]
        w = jnp.tile(kernel2d.reshape(k, k, 1, 1).astype(x.dtype), (1, 1, 1, c))
        return lax.conv_general_dilated(
            x, w, (self.factor, self.factor), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _resample_matrix(taps: np.ndarray, n: int, pad: int, factor: int
                     ) -> np.ndarray:
    """Dense 1-D resampling matrix M (n_out, n) with the edge-pad FOLDED in.

    Row o of the strided valid conv over the padded axis is
    ``taps`` at columns [o*factor, o*factor+k) of the padded axis; the
    replication pad is itself linear (P[i, clip(i-pad, 0, n-1)] = 1), so
    M = A @ P absorbs it. Used by the custom-VJP adjoint below."""
    k = taps.shape[0]
    np_pad = n + 2 * pad
    n_out = (np_pad - k) // factor + 1
    m = np.zeros((n_out, n), np.float32)
    for o in range(n_out):
        for j in range(k):
            src = min(max(o * factor + j - pad, 0), n - 1)
            m[o, src] += taps[j]
    return m


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _downsample_sep(x, taps_t, factor, pad):
    """Separable strided depthwise resample with a layout-safe adjoint.

    Forward: edge pad + two 1-D depthwise valid convs (unchanged math).
    Backward: XLA lowers the transposed 3-channel depthwise conv at DIP
    scale into a T(1,128)-layout convolution fusion + copies costing
    ~1.5 ms/iter (the largest ops in the round-3 DIP step trace). The
    adjoint here is two dense matrix contractions with the static
    resampling matrices instead: dx = M_h^T G M_w (tiny MXU work)."""
    taps = jnp.asarray(np.asarray(taps_t, np.float32))
    lead = x.shape[:-3]
    xr = x.reshape((-1,) + x.shape[-3:])
    if pad > 0:
        xr = jnp.pad(xr, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")
    y = _depthwise_conv_1d(xr, taps, axis=1, stride=factor)
    y = _depthwise_conv_1d(y, taps, axis=2, stride=factor)
    return y.reshape(lead + y.shape[-3:])


def _downsample_sep_fwd(x, taps_t, factor, pad):
    # x rides the residuals only for its static shape/dtype (it is alive in
    # the surrounding graph anyway); the adjoint never reads its values
    return _downsample_sep(x, taps_t, factor, pad), x


def _downsample_sep_bwd(taps_t, factor, pad, res, g):
    shape, dtype = res.shape, res.dtype
    h, w = shape[-3], shape[-2]
    taps = np.asarray(taps_t, np.float32)
    mh = jnp.asarray(_resample_matrix(taps, h, pad, factor))
    mw = jnp.asarray(_resample_matrix(taps, w, pad, factor))
    g32 = g.astype(jnp.float32)
    t = jnp.einsum("oh,...owc->...hwc", mh, g32)
    dx = jnp.einsum("pw,...hpc->...hwc", mw, t)
    return (dx.astype(dtype),)


_downsample_sep.defvjp(_downsample_sep_fwd, _downsample_sep_bwd)


def downsample_lanczos(
    x: jnp.ndarray, factor: int, phase: float = 0.5, preserve_size: bool = True
) -> jnp.ndarray:
    """The DIP loss operator: lanczos2 downsample (parity: DIP.py:29)."""
    ds = Downsampler(
        n_planes=x.shape[-1],
        factor=factor,
        kernel_type="lanczos2",
        phase=phase,
        preserve_size=preserve_size,
    )
    return ds(x)
