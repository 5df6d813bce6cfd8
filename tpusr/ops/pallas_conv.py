"""Pallas fused 3x3 conv for the DIP/SRGAN hot path.

The conv probe (DESIGN.md) showed this chip is ~170 TF/s MXU against only
~350 GB/s effective HBM, and that every extra elementwise/pad pass at
512^2x128 costs ~0.4 ms. XLA runs the skip-net block as
pad-copy -> conv -> BN-stat reduction -> (fused normalize/act), paying
several whole-tensor passes per conv. This kernel collapses the block to
ONE read and ONE write per conv:

  * prologue (VPU, on the input tile in VMEM): optional per-channel affine
    (the BN normalize folded to eff_scale/eff_bias) + optional LeakyReLU —
    the elementwise tail of the PREVIOUS conv block;
  * halo handling in the DMA/index path: reflect ('reflection', parity with
    models/DIP/utils.py:96-102) or zero padding never materializes a padded
    copy in HBM;
  * 3x3 conv as 9 MXU matmuls accumulated in f32;
  * epilogue: per-channel sum / sum-of-squares partials of the OUTPUT — the
    batch statistics the next BatchNorm needs, so its separate half-
    bandwidth reduction pass disappears.

Training rides a custom VJP (pallas_call has no autodiff rule): dgrad is
the same kernel shape with flipped weights over the output cotangent plus
the prologue's local derivative; wgrad accumulates the 9 tap GEMMs
transposed. Residuals are (x, w, es, eb) — all tensors the surrounding
graph already keeps alive.

Only the shapes that dominate the profile go through Pallas (batch 1,
k=3, C multiples of the 128-lane tile); everything else falls back to
conv_apply. Gated hard off on non-TPU backends (the CPU interpreter is
used by tests via interpret=True explicitly).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(H: int) -> int:
    """Largest row-tile <= 64 that divides H (VMEM budget ~ a few MB)."""
    for th in (64, 32, 16, 8):
        if H % th == 0:
            return th
    return 0


def _fwd_kernel(x_hbm, w_ref, es_ref, eb_ref, y_ref, stat_ref, win, sem, *,
                TH, H, W, Cin, reflect, affine, act, stats):
    i = pl.program_id(0)
    nprog = H // TH  # static

    def _copy(src_rows, dst_rows):
        dma = pltpu.make_async_copy(x_hbm.at[0, src_rows],
                                    win.at[dst_rows, pl.ds(1, W)], sem)
        dma.start()
        dma.wait()

    # --- load the (TH+2, W, Cin) input window rows [i*TH-1, i*TH+TH+1) ---
    # reflect halos are filled from real rows BEFORE the prologue (the
    # elementwise prologue commutes with reflection); zero halos are
    # written AFTER it (affine(0) = eff_bias != 0 must not leak in).
    if nprog == 1:
        _copy(pl.ds(0, TH), pl.ds(1, TH))
        if reflect:
            win[0] = win[2]
            win[TH + 1] = win[TH - 1]
    else:
        @pl.when(i == 0)
        def _():
            _copy(pl.ds(0, TH + 1), pl.ds(1, TH + 1))
            if reflect:
                win[0] = win[2]

        @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
        def _():
            _copy(pl.ds(i * TH - 1, TH + 2), pl.ds(0, TH + 2))

        @pl.when(i == nprog - 1)
        def _():
            _copy(pl.ds(H - TH - 1, TH + 1), pl.ds(0, TH + 1))
            if reflect:
                win[TH + 1] = win[TH - 1]

    if reflect:
        win[:, 0] = win[:, 2]
        win[:, W + 1] = win[:, W - 1]

    # --- prologue: previous block's BN-affine + activation (in place) ---
    if affine or act:
        a0 = win[:]
        if affine:
            a0 = a0 * es_ref[:].astype(a0.dtype) + eb_ref[:].astype(a0.dtype)
        if act == "leaky_relu":
            a0 = jnp.where(a0 >= 0, a0, 0.2 * a0)
        win[:] = a0

    if not reflect:
        zc = jnp.zeros_like(win[:, 0])
        win[:, 0] = zc
        win[:, W + 1] = zc
        if nprog == 1:
            win[0] = jnp.zeros_like(win[0])
            win[TH + 1] = jnp.zeros_like(win[TH + 1])
        else:
            @pl.when(i == 0)
            def _():
                win[0] = jnp.zeros_like(win[0])

            @pl.when(i == nprog - 1)
            def _():
                win[TH + 1] = jnp.zeros_like(win[TH + 1])

    a = win[:]

    # --- 3x3 conv: 9 MXU matmuls, f32 accumulation ---
    acc = jnp.zeros((TH * W, w_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = a[dy:dy + TH, dx:dx + W].reshape(TH * W, Cin)
            acc = acc + jnp.dot(patch, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)

    y = acc.reshape(1, TH, W, w_ref.shape[-1])
    y_ref[:] = y.astype(y_ref.dtype)
    if stats:
        stat_ref[0, 0] = jnp.sum(y, axis=(0, 1, 2))
        stat_ref[0, 1] = jnp.sum(jnp.square(y), axis=(0, 1, 2))


def _fwd_pallas(x, w, es, eb, *, affine, act, reflect, stats, interpret):
    _, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TH = _pick_tile_h(H)
    n = H // TH
    kern = functools.partial(
        _fwd_kernel, TH=TH, H=H, W=W, Cin=Cin,
        reflect=reflect, affine=affine, act=act, stats=stats)
    out_shapes = [jax.ShapeDtypeStruct((1, H, W, Cout), x.dtype),
                  jax.ShapeDtypeStruct((n, 2, Cout), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, TH, W, Cout), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, Cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    y, parts = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # es
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eb
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W + 2, Cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, w, es, eb)
    if stats:
        return y, jnp.sum(parts, axis=0)
    return y, None


# ---------------------------------------------------------------- reference
def _prologue_ref(x, es, eb, affine, act):
    a = x
    if affine:
        a = a * es.astype(a.dtype) + eb.astype(a.dtype)
    if act == "leaky_relu":
        a = jnp.where(a >= 0, a, 0.2 * a)
    return a


def _fused_ref(x, w, es, eb, *, affine, act, reflect, stats):
    """Pure-XLA reference implementation (used for the custom-VJP backward
    and as the numerical oracle in tests)."""
    a = _prologue_ref(x, es, eb, affine, act)
    mode = "reflect" if reflect else "constant"
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    y = jax.lax.conv_general_dilated(
        ap, w.astype(a.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if stats:
        s = jnp.sum(y.astype(jnp.float32), axis=(0, 1, 2))
        ss = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2))
        return y, jnp.stack([s, ss])
    return y, None


# ---------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_conv(x, w, es, eb, affine, act, reflect, stats, interpret):
    y, st = _fwd_pallas(x, w, es, eb, affine=affine, act=act,
                        reflect=reflect, stats=stats, interpret=interpret)
    return (y, st) if stats else y


def _fused_conv_fwd(x, w, es, eb, affine, act, reflect, stats, interpret):
    out = _fused_conv(x, w, es, eb, affine, act, reflect, stats, interpret)
    return out, (x, w, es, eb)


def _fused_conv_bwd(affine, act, reflect, stats, interpret, res, g):
    # Stage-A backward: VJP of the XLA reference (correct by construction;
    # Pallas dgrad/wgrad kernels replace this in the next stage).
    x, w, es, eb = res

    def f(x, w, es, eb):
        y, st = _fused_ref(x, w, es, eb, affine=affine, act=act,
                           reflect=reflect, stats=stats)
        return (y, st) if stats else y

    _, vjp = jax.vjp(f, x, w, es, eb)
    dx, dw, des, deb = vjp(g)
    if not affine:
        des = jnp.zeros_like(es)
        deb = jnp.zeros_like(eb)
    return dx, dw, des, deb


_fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def fused_conv3x3(x, w, eff_scale=None, eff_bias=None, *, act=None,
                  pad_mode="reflection", stats=False, interpret=False):
    """y = conv3x3(act(x*eff_scale+eff_bias)) with in-kernel halo handling.

    x: (1,H,W,Cin) bf16/f32; w: (3,3,Cin,Cout). Returns y or (y, stats2xC)
    where stats = [sum(y), sum(y^2)] per channel (f32). Differentiable via
    custom VJP. Requires H divisible by 8 and C multiples of 128 for the
    TPU path; callers gate on `fused_conv_supported`.
    """
    affine = eff_scale is not None
    Cin = x.shape[-1]
    Cout = w.shape[-1]
    if eff_scale is None:
        eff_scale = jnp.ones((Cin,), jnp.float32)
        eff_bias = jnp.zeros((Cin,), jnp.float32)
    return _fused_conv(x, w, eff_scale, eff_bias, affine, act,
                       pad_mode == "reflection", stats, interpret)


def fused_conv_supported(x_shape, k: int, stride: int) -> bool:
    """Shapes the Pallas path accepts (everything else -> conv_apply)."""
    if len(x_shape) != 4:
        return False
    n, H, W, C = x_shape
    return (n == 1 and k == 3 and stride == 1 and C % 128 == 0
            and H % 8 == 0 and H >= 64 and W >= 128 and W <= 1024)
