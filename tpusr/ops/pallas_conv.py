"""Pallas fused 3x3 conv for the DIP/SRGAN hot path.

The conv probe (DESIGN.md) showed this chip is ~170 TF/s MXU against only
~350 GB/s effective HBM, and that every extra elementwise/pad pass at
512^2x128 costs ~0.4 ms. XLA runs the skip-net block as
pad-copy -> conv -> BN-stat reduction -> (fused normalize/act), paying
several whole-tensor passes per conv. This kernel collapses the block to
ONE read and ONE write per conv:

  * prologue (VPU, on the input tile in VMEM): optional per-channel affine
    (the BN normalize folded to eff_scale/eff_bias) + optional
    LeakyReLU(0.2) — the elementwise tail of the PREVIOUS conv block;
  * halo handling in the DMA/index path: reflect ('reflection', parity with
    models/DIP/utils.py:96-102) or zero padding never materializes a padded
    copy in HBM;
  * 3x3 conv as 9 MXU matmuls accumulated in f32, tap-grouped onto full
    128-wide passes for small C;
  * epilogue: per-channel sum / sum-of-squares partials of the OUTPUT —
    the batch statistics the next BatchNorm needs, so its separate
    reduction pass disappears.

Training rides a custom VJP (pallas_call has no autodiff rule): dgrad is
the same kernel shape with flipped weights over the output cotangent plus
the prologue's local derivative; wgrad accumulates the 9 tap GEMMs
transposed, falling back to XLA alone when its dw block exceeds VMEM.
32/64-channel operands ride lane-padded through both directions (small
Cout pads the cotangent side).

(Removed after round-3 hardware A/Bs — see DESIGN.md "the folding family
verdict" and git history: static tap subsets, in-kernel zero-seam canvas
masking, and the PReLU prologue existed for the batched zero-seam folded
dataflows, which measured slower than XLA's batched convs at the full
train step and were pruned.)

Only the shapes that dominate the profile go through Pallas (batch 1,
k=3, C multiples of the 128-lane tile or 32/64); everything else falls
back to conv_apply. Gated hard off on non-TPU backends (the CPU
interpreter is used by tests via interpret=True explicitly).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(H: int, W: int, Cin: int, Cout: int, isz: int,
                 has_base: bool = False) -> int:
    """Largest row-tile dividing H whose working set fits the ~16 MB VMEM:
    input window (TH+2,W,Cin) + 2 shifted value copies + tap-group patch +
    f32 accumulator + output block (+ the optional base-input block), with
    headroom for Mosaic temporaries."""
    budget = 11 * 1024 * 1024
    for th in (64, 32, 16, 8):
        if H % th != 0:
            continue
        win = (th + 2) * W * max(Cin, 128) * isz  # <128 lanes pad to 128
        patch = th * W * 128 * isz if Cin < 128 else 0
        acc = th * W * max(Cout, 128) * 4
        out = th * W * max(Cout, 128) * isz
        base = out if has_base else 0
        if 3 * win + patch + acc + out + base <= budget:
            return th
    return 0


def _fwd_kernel(x_hbm, w_ref, es_ref, eb_ref, *refs,
                TH, H, W, Cin, RC, reflect, affine, act, stats, C0=None,
                has_base=False):
    if has_base:
        # base: an already-computed (1,H,W,Cout) partial sum (e.g. the thin
        # skip part of a SplitConv, or a residual-block input) added
        # in-VMEM so the stats epilogue reduces the FINAL output — the
        # Σ(a+b)² cross term makes partial stats unsplittable, so the sum
        # must happen before the epilogue.
        base_ref, y_ref, stat_ref, win, sem = refs
    else:
        base_ref = None
        y_ref, stat_ref, win, sem = refs
    i = pl.program_id(0)
    nprog = H // TH  # static

    # Mosaic alignment rule (found on hardware): DMA destinations and memref
    # slices must not carry a sublane (second-minor) offset — the scratch is
    # therefore FULL-WIDTH (TH+2, W, Cin) with row halos in dim 0 (untiled),
    # and the +/-1 column shifts happen at the VALUE level below.
    # C0: static 8-aligned column offset of this window into a wider HBM
    # operand (the W>1024 overlap-discard path, _fwd_pallas_cols).
    def _copy(src_rows, dst_rows):
        src = (x_hbm.at[0, src_rows] if C0 is None
               else x_hbm.at[0, src_rows, pl.ds(C0, W)])
        dma = pltpu.make_async_copy(src, win.at[dst_rows], sem)
        dma.start()
        dma.wait()

    # --- load input rows [i*TH-1, i*TH+TH+1) into win rows ---
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

    # --- prologue: previous block's BN-affine + activation (in place) ---
    if affine or act:
        a0 = win[:]
        if affine:
            a0 = a0 * es_ref[:].astype(a0.dtype) + eb_ref[:].astype(a0.dtype)
        if act == "leaky_relu":
            # max/min form: bf16 vector compares (jnp.where) don't lower on
            # this target; maximum/minimum do, and the math is identical.
            zero = jnp.zeros((), a0.dtype)
            a0 = jnp.maximum(a0, zero) + jnp.asarray(0.2, a0.dtype) * jnp.minimum(a0, zero)
        win[:] = a0

    if not reflect:
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

    # --- column-shifted views (value level; post-prologue so zero columns
    # stay exactly zero and reflection commutes with the elementwise ops) ---
    # Small-C operands arrive zero-padded to the 128-lane tile (Mosaic
    # cannot DMA-slice a lane-padded HBM memref); drop the pad lanes at the
    # VALUE level so tap-grouping packs only real channels.
    am = win[:] if RC == Cin else win[:][:, :, :RC]
    if reflect:
        lcol = am[:, 1:2]
        rcol = am[:, W - 2:W - 1]
    else:
        lcol = jnp.zeros_like(am[:, 0:1])
        rcol = lcol
    al = jnp.concatenate([lcol, am[:, :W - 1]], axis=1)   # column dx = -1
    ar = jnp.concatenate([am[:, 1:], rcol], axis=1)       # column dx = +1

    # --- 3x3 conv on the MXU, f32 accumulation ---
    # w_ref is (9, Cin, Cout) by tap (t = 3*dy+dx). For Cin < 128 the K dim
    # of a per-tap matmul wastes the systolic array (Cin=32 fills 1/4), so
    # taps are GROUPED: 128//Cin shifted inputs lane-concatenated to a
    # 128-wide patch, matched by stacking the kernel rows — ceil(9C/128)
    # MXU passes instead of 9 (2.5x fewer for C=32).
    dn = (((2,), (0,)), ((), ()))  # contract channel dim
    tap_srcs = [(t // 3, (al, am, ar)[t % 3]) for t in range(9)]
    g = max(1, 128 // RC) if RC < 128 else 1
    acc = jnp.zeros((TH, W, w_ref.shape[-1]), jnp.float32)
    for t0 in range(0, len(tap_srcs), g):
        grp = tap_srcs[t0:t0 + g]
        if len(grp) == 1:
            dy, src = grp[0]
            patch = src[dy:dy + TH]
            wg = w_ref[t0]
        else:
            patch = jnp.concatenate([src[dy:dy + TH] for dy, src in grp],
                                    axis=-1)
            wg = w_ref[pl.ds(t0, len(grp))].reshape(len(grp) * RC, -1)
        acc = acc + jax.lax.dot_general(patch, wg, dn,
                                        preferred_element_type=jnp.float32)

    if has_base:
        acc = acc + base_ref[0].astype(jnp.float32)
    y = acc[None]
    y_ref[:] = y.astype(y_ref.dtype)
    if stats:
        stat_ref[0, 0] = jnp.sum(y, axis=(0, 1, 2))
        stat_ref[0, 1] = jnp.sum(jnp.square(y), axis=(0, 1, 2))


def _fwd_pallas_cols(x, w, es, eb, *, affine, act, reflect, stats,
                     interpret):
    """W > 1024: column overlap-discard onto the fast 1-D banded kernel.

    Supersedes _fwd_pallas_2d on the auto route (round 2 measured the 2-D
    grid at 10.9 ms vs XLA 7.4 for one 1080p 64-ch conv — odd-offset
    relayouts per matmul). Here each column window <= 1024 runs the proven
    1-D kernel; interior seams carry one overlap column each side whose
    output is discarded (window-edge zero/reflect halos only affect that
    column), plus rounding columns to keep windows sublane-aligned.
    """
    _, H, W, Cin = x.shape
    outs = []
    o0 = 0
    while o0 < W:
        # 512-col output windows: a (TH+2, 520, 128) working set fits the
        # VMEM budget at TH=8 (768-col windows silently failed _pick_tile_h
        # and fell back to XLA per window — measured round 3)
        o1 = min(W, o0 + 512)
        # 8-aligned window bounds: the kernel DMAs the column window
        # straight from the full-width HBM operand (no XLA slice copies),
        # and HBM DMA windows must not carry sublane offsets
        il = max(0, (o0 - 1) // 8 * 8)
        ir = min(W, -(-(o1 + 1) // 8) * 8)
        y, _ = _fwd_pallas(x, w, es, eb, affine=affine, act=act,
                           reflect=reflect, stats=False,
                           interpret=interpret, col_win=(il, ir - il))
        outs.append(y[:, :, o0 - il : o1 - il])
        o0 = o1
    return jnp.concatenate(outs, axis=2), None


def _fwd_pallas(x, w, es, eb, *, affine, act, reflect, stats, interpret,
                col_win=None, base=None):
    _, H, W, Cin = x.shape
    Cout = w.shape[-1]
    RC = w.shape[2]  # logical input channels; x may carry 128-lane padding
    C0 = None
    if col_win is not None:
        C0, W = col_win  # kernel sees only this column window of x
    elif W > 1024:
        if stats or base is not None:  # column windows don't stitch these
            xl = x if RC == Cin else x[..., :RC]
            return _fused_ref(xl, w, es, eb, affine=affine, act=act,
                              reflect=reflect, stats=stats, base=base)
        return _fwd_pallas_cols(x, w, es, eb, affine=affine, act=act,
                                reflect=reflect, stats=stats,
                                interpret=interpret)
    TH = _pick_tile_h(H, W, Cin, Cout, x.dtype.itemsize,
                      has_base=base is not None)
    if TH == 0:  # nothing fits VMEM at this width — XLA reference path
        xl = x if RC == Cin else x[..., :RC]
        if C0 is not None:
            xl = xl[:, :, C0 : C0 + W]
        return _fused_ref(xl, w, es, eb, affine=affine, act=act,
                          reflect=reflect, stats=stats, base=base)
    n = H // TH
    kern = functools.partial(
        _fwd_kernel, TH=TH, H=H, W=W, Cin=Cin, RC=RC,
        reflect=reflect, affine=affine, act=act, stats=stats, C0=C0,
        has_base=base is not None)
    out_shapes = [jax.ShapeDtypeStruct((1, H, W, Cout), x.dtype),
                  jax.ShapeDtypeStruct((n, 2, Cout), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, TH, W, Cout), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, Cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w (T, Cin, Cout)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # es
        pl.BlockSpec(memory_space=pltpu.VMEM),  # eb
    ]
    operands = [x, w.reshape(9, RC, Cout), es, eb]
    if base is not None:
        in_specs.append(pl.BlockSpec((1, TH, W, Cout), lambda i: (0, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(base)
    y, parts = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, Cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*operands)
    if stats:
        return y, jnp.sum(parts, axis=0)
    return y, None


# ------------------------------------------------------------ wgrad kernel
def _wgrad_kernel(x_hbm, g_ref, es_ref, eb_ref, dw_ref, win, sem, *,
                  TH, H, W, Cin, reflect, affine, act):
    """dw[t] += patch_t(act(affine(x)))^T @ G per row tile.

    Same halo/prologue structure as _fwd_kernel (the wgrad's input padding
    IS the forward padding — no transpose folds needed); G arrives as an
    aligned blocked VMEM operand; dw (9, Cin, Cout) f32 is one revisited
    output block accumulated across the grid.
    """
    i = pl.program_id(0)
    nprog = H // TH

    def _copy(src_rows, dst_rows):
        dma = pltpu.make_async_copy(x_hbm.at[0, src_rows],
                                    win.at[dst_rows], sem)
        dma.start()
        dma.wait()

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

    if affine or act:
        a0 = win[:]
        if affine:
            a0 = a0 * es_ref[:].astype(a0.dtype) + eb_ref[:].astype(a0.dtype)
        if act == "leaky_relu":
            zero = jnp.zeros((), a0.dtype)
            a0 = (jnp.maximum(a0, zero)
                  + jnp.asarray(0.2, a0.dtype) * jnp.minimum(a0, zero))
        win[:] = a0

    if not reflect:
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

    am = win[:]
    if reflect:
        lcol = am[:, 1:2]
        rcol = am[:, W - 2:W - 1]
    else:
        lcol = jnp.zeros_like(am[:, 0:1])
        rcol = lcol
    al = jnp.concatenate([lcol, am[:, :W - 1]], axis=1)
    ar = jnp.concatenate([am[:, 1:], rcol], axis=1)

    g2 = g_ref[0].reshape(TH * W, g_ref.shape[-1])
    # contract the TH*W dim: (N, Cin)^T @ (N, Cout) — K=TH*W fills the MXU.
    dn = (((0,), (0,)), ((), ()))
    for t in range(9):
        dy, src = t // 3, (al, am, ar)[t % 3]
        patch = src[dy:dy + TH].reshape(TH * W, Cin)
        part = jax.lax.dot_general(patch, g2, dn,
                                   preferred_element_type=jnp.float32)
        if nprog == 1:
            dw_ref[t] = part
        else:
            @pl.when(i == 0)
            def _(part=part, t=t):
                dw_ref[t] = part

            @pl.when(i > 0)
            def _(part=part, t=t):
                dw_ref[t] = dw_ref[t] + part


def _pick_tile_wgrad(H: int, W: int, Cin: int, Cout: int, isz: int) -> int:
    """wgrad-specific VMEM budget: no (TH,W,Cout) accumulator/output blocks
    (dw is a tiny revisited (9,Cin,Cout) block), so the row tile can be
    2x the forward's — measured 1.17 -> 0.99 ms at (512,512,128->128) bf16
    (fewer grid programs: half the DMA waits and dw accumulation passes).
    Returns 0 when nothing fits (e.g. huge packed-channel dw blocks) — the
    caller must fall back to the XLA wgrad for that operand."""
    budget = 11 * 1024 * 1024
    for th in (64, 32, 16, 8):
        if H % th != 0:
            continue
        win = (th + 2) * W * max(Cin, 128) * isz
        gblk = th * W * max(Cout, 128) * isz
        dw = 9 * max(Cin, 128) * max(Cout, 128) * 4
        if 3 * win + gblk + dw <= budget:
            return th
    return 0


def _wgrad_pallas(x, g, es, eb, *, affine, act, reflect, interpret):
    """(3, 3, Cin, Cout) f32 kernel cotangent via the wgrad kernel."""
    _, H, W, Cin = x.shape
    Cout = g.shape[-1]
    TH = _pick_tile_wgrad(H, W, Cin, Cout, x.dtype.itemsize)
    if TH == 0:
        return None
    n = H // TH
    kern = functools.partial(
        _wgrad_kernel, TH=TH, H=H, W=W, Cin=Cin,
        reflect=reflect, affine=affine, act=act)
    dwT = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec((1, TH, W, Cout), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),  # G, aligned blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # es
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eb
        ],
        out_shape=jax.ShapeDtypeStruct((9, Cin, Cout), jnp.float32),
        out_specs=pl.BlockSpec((9, Cin, Cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, Cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, g, es, eb)
    return dwT.reshape(3, 3, Cin, Cout)


# ---------------------------------------------------------------- reference
def _prologue_ref(x, es, eb, affine, act):
    a = x
    if affine:
        a = a * es.astype(a.dtype) + eb.astype(a.dtype)
    if act == "leaky_relu":
        a = jnp.where(a >= 0, a, 0.2 * a)
    return a


def _fused_ref(x, w, es, eb, *, affine, act, reflect, stats, base=None):
    """Pure-XLA reference implementation (used for the custom-VJP backward
    and as the numerical oracle in tests)."""
    a = _prologue_ref(x, es, eb, affine, act)
    mode = "reflect" if reflect else "constant"
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    y = jax.lax.conv_general_dilated(
        ap, w.astype(a.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if base is not None:
        y = y + base.astype(y.dtype)
    if stats:
        y32 = y.astype(jnp.float32)
        s = jnp.sum(y32, axis=(0, 1, 2))
        ss = jnp.sum(jnp.square(y32), axis=(0, 1, 2))
        return y, jnp.stack([s, ss])
    return y, None


# ---------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_conv(x, w, es, eb, base, affine, act, reflect, stats,
                interpret):
    y, st = _fwd_pallas(x, w, es, eb, affine=affine, act=act,
                        reflect=reflect, stats=stats, interpret=interpret,
                        base=base)
    return (y, st) if stats else y


def _fused_conv_fwd(x, w, es, eb, base, affine, act, reflect, stats,
                    interpret):
    out = _fused_conv(x, w, es, eb, base, affine, act, reflect,
                      stats, interpret)
    y = out[0] if stats else out
    # y rides the residuals only for the stats cotangent (sum/sum² backprop
    # needs the primal output); it is already materialized in HBM. base
    # rides only for its pytree None-ness (db must mirror its structure).
    return out, (x, w, es, eb, y if stats else None, base)


def _reflect_fold_corrections(dpa, G, wd):
    """Add the reflect-pad-transpose boundary folds to a zero-SAME dgrad.

    dgrad-with-reflect = fold(T) where T is the VALID transpose map over the
    1-padded domain; its interior IS the zero-SAME dgrad (computed by the
    Pallas kernel), and the virtual border rows/cols fold back into rows/
    cols 1 and n-2: T[-1,v]=Σ_dx G[0,v+1-dx]·w[0,dx] (only dy=0 taps reach
    above the top), etc. Strips are single-row/col 1x3 convs — negligible.
    """
    _, H, W, Ci = dpa.shape
    dn1 = ("NWC", "WIO", "NWC")

    def strip(row, wrow):  # row (1, L, Co), wrow (3, Ci, Co) -> (1, L, Ci)
        k = wrow[::-1].transpose(0, 2, 1)  # (3, Co, Ci), flipped taps
        return jax.lax.conv_general_dilated(row, k, (1,), ((1, 1),),
                                            dimension_numbers=dn1)

    top = strip(G[:, 0], wd[0])          # T[-1, v]
    bot = strip(G[:, H - 1], wd[2])      # T[H, v]
    left = strip(G[:, :, 0], wd[:, 0])   # T[u, -1]
    right = strip(G[:, :, W - 1], wd[:, 2])  # T[u, W]
    dpa = dpa.at[:, 1].add(top)
    dpa = dpa.at[:, H - 2].add(bot)
    dpa = dpa.at[:, :, 1].add(left)
    dpa = dpa.at[:, :, W - 2].add(right)
    # corners: both coordinates virtual
    for (h, w_), (gy, gx), (ky, kx) in (
            ((1, 1), (0, 0), (0, 0)),
            ((1, W - 2), (0, W - 1), (0, 2)),
            ((H - 2, 1), (H - 1, 0), (2, 0)),
            ((H - 2, W - 2), (H - 1, W - 1), (2, 2))):
        corner = jnp.einsum("o,co->c", G[0, gy, gx].astype(jnp.float32),
                            wd[ky, kx].astype(jnp.float32)).astype(dpa.dtype)
        dpa = dpa.at[0, h, w_].add(corner)
    return dpa


def _fused_conv_bwd(affine, act, reflect, stats, interpret, res, g):
    """NOTE: nondiff args arrive first in custom_vjp order."""
    """Hand-built backward: exactly one dgrad conv + one wgrad conv + fused
    elementwise — no forward recompute. When shapes allow, BOTH convs run
    as Pallas kernels: dgrad IS the forward kernel with the rotated/
    transposed weights over G (zero-SAME; reflect adds the strip folds of
    _reflect_fold_corrections), and wgrad is _wgrad_kernel (halo + prologue
    recompute in VMEM, 9 transposed GEMMs with K=TH*W, grid-accumulated).
    Profiled rationale: XLA lowered the wgrad linear-transpose to ~40 TF/s
    reduce fusions plus a whole-tensor pad copy — together the largest ops
    in the DIP step trace.

    The base input (if any) is a straight add-through: its cotangent is the
    combined output cotangent G (incl. the stats sum/sum² terms)."""
    x, w, es, eb, y, base = res
    pad_c = x.shape[-1] - w.shape[2]  # lane padding on the operand (small-C)
    xp = x  # physical (possibly lane-padded) operand for the Pallas kernels
    if pad_c:
        x = x[..., :w.shape[2]]
    if stats:
        gy, gst = g
        # y-stats cotangent: d(sum)/dy = 1, d(sum²)/dy = 2y, both f32 in fwd
        stat_term = gst[0] + 2.0 * y.astype(jnp.float32) * gst[1]
        G = (gy.astype(jnp.float32) + stat_term).astype(gy.dtype)
    else:
        G = g

    # prologue primal pieces (cheap elementwise; fused by XLA). es/eb may
    # be lane-padded along with x — use the logical slice here.
    es_l = es[:w.shape[2]] if (affine and pad_c) else es
    eb_l = eb[:w.shape[2]] if (affine and pad_c) else eb
    if affine:
        a0 = x * es_l.astype(x.dtype) + eb_l.astype(x.dtype)
    else:
        a0 = x
    if act == "leaky_relu":
        pa = jnp.where(a0 >= 0, a0, 0.2 * a0)
        aprime = jnp.where(a0 >= 0, jnp.asarray(1.0, x.dtype),
                           jnp.asarray(0.2, x.dtype))
    else:
        pa = a0
        aprime = None

    mode = "reflect" if reflect else "constant"
    dn = ("NHWC", "HWIO", "NHWC")
    wd = w.astype(x.dtype)
    H, W = x.shape[1], x.shape[2]
    Ci, Co = wd.shape[2], wd.shape[3]

    # Small-C handling (hardware rule: row-slicing DMA of a lane-padded
    # <128-ch HBM memref fails): the x side rides lane-padded (xp) exactly
    # like the forward; a small Cout pads G to 128 lanes — zero pad lanes
    # contribute nothing to dgrad (their rotated weights are zero-padded
    # too) and produce discarded zero dw columns. Reflect stays on the
    # no-padding path only (the strip corrections index logical channels).
    pad_g = 128 - Co if Co in (32, 64) else 0
    pallas_ok = (W <= 1024 and W % 8 == 0 and 64 <= W  # no wide wgrad (yet)
                 and H % 8 == 0 and H >= 8
                 and xp.shape[-1] % 128 == 0
                 and (Co % 128 == 0 or pad_g)
                 and not ((pad_c or pad_g) and reflect)
                 and _pick_tile_h(H, W, Co, Ci, x.dtype.itemsize) > 0
                 and _pick_tile_h(H, W, Ci, Co, x.dtype.itemsize) > 0)

    w_rot = wd[::-1, ::-1].transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    dpa = dw = None
    if pallas_ok:
        Gp = (jnp.pad(G, ((0, 0),) * 3 + ((0, pad_g),)) if pad_g else G)
        # dgrad = the forward kernel over G with rotated weights (zero-SAME).
        # When x was lane-padded, emit dpa lane-padded too (dx's pad lanes
        # are discarded by the wrapper pad's own VJP) — a <128-lane output
        # block would hit the same DMA rule.
        w_rot_p = (jnp.pad(w_rot, ((0, 0),) * 3 + ((0, pad_c),)) if pad_c
                   else w_rot)
        dpa, _ = _fwd_pallas(Gp, w_rot_p, es, eb, affine=False, act=None,
                             reflect=False, stats=False, interpret=interpret)
        if pad_c:
            dpa = dpa[..., :Ci]
        if reflect:
            dpa = _reflect_fold_corrections(dpa, G, wd)
        # wgrad may independently not fit VMEM (its dw output block scales
        # with Cin*Cout — packed-channel convs can exceed the budget even
        # when the dgrad side fits); fall back per-operand, not per-conv.
        dwp = _wgrad_pallas(xp, Gp, es, eb, affine=affine, act=act,
                            reflect=reflect, interpret=interpret)
        if dwp is not None:
            dw = dwp[:, :, :Ci, :Co].astype(wd.dtype)
    if dpa is None:
        # XLA path: dgrad as a forward conv through conv_apply's banded
        # fast path; T's virtual borders fold back for reflect.
        from tpusr.models.layers import conv_apply

        if reflect:
            Gp = jnp.pad(G, ((0, 0), (1, 1), (1, 1), (0, 0)))
            T = conv_apply(Gp, w_rot, 1, "zero")      # (1, H+2, W+2, Cin)
            Tc = T[:, :, 1:-1]                        # drop virtual cols...
            Tc = Tc.at[:, :, 1].add(T[:, :, 0])       # ...folding them in
            Tc = Tc.at[:, :, W - 2].add(T[:, :, W + 1])
            dpa = Tc[:, 1:-1]
            dpa = dpa.at[:, 1].add(Tc[:, 0])
            dpa = dpa.at[:, H - 2].add(Tc[:, H + 1])
        else:
            dpa = conv_apply(G, w_rot, 1, "zero")
    if dw is None:
        # wgrad: conv is linear in w too
        app = jnp.pad(pa, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)

        def conv_in_w(w_):
            return jax.lax.conv_general_dilated(app, w_, (1, 1), "VALID",
                                                dimension_numbers=dn)

        dw, = jax.linear_transpose(
            conv_in_w, jax.ShapeDtypeStruct(wd.shape, wd.dtype))(G)

    # prologue backward
    if aprime is not None:
        dpre = dpa * aprime
    else:
        dpre = dpa
    if affine:
        dx = dpre * es_l.astype(x.dtype)
        red = (0, 1, 2)
        des = jnp.sum(dpre.astype(jnp.float32) * x.astype(jnp.float32),
                      axis=red)
        deb = jnp.sum(dpre.astype(jnp.float32), axis=red)
        if pad_c:  # residual es/eb are lane-padded; mirror their shape
            des = jnp.pad(des, (0, pad_c))
            deb = jnp.pad(deb, (0, pad_c))
    else:
        dx = dpre
        des = jnp.zeros_like(es)
        deb = jnp.zeros_like(eb)
    if pad_c:
        dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    db = None if base is None else G.astype(base.dtype)
    return dx, dw, des, deb, db


_fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def fused_conv3x3(x, w, eff_scale=None, eff_bias=None, *, act=None,
                  pad_mode="reflection", stats=False, interpret=False,
                  base=None):
    """y = conv3x3(act(x*eff_scale+eff_bias)) [+ base] with in-kernel halos.

    x: (1,H,W,Cin) bf16/f32; w: (3,3,RC,Cout) with RC <= Cin. Returns y or
    (y, stats2xC) where stats = [sum(y), sum(y^2)] per channel (f32).
    base (optional, (1,H,W,Cout)): a precomputed partial sum added in-VMEM
    before the stats epilogue — the SplitConv merge path feeds its thin
    skip part here so the epilogue reduces the FINAL merged output.
    Differentiable via custom VJP. Callers gate on `fused_conv_supported`.

    Small-C convention: Mosaic cannot DMA-slice lane-padded (<128 ch) HBM
    operands, so RC in (32, 64) rides as a 128-lane operand — either the
    caller passes x already zero-padded to 128 channels (free when the
    producer emits it padded: a 32-ch tensor occupies 128 physical lanes in
    HBM regardless), or this wrapper pads. The kernel drops the pad lanes
    at the value level and tap-groups 128//RC shifted windows per MXU pass.
    """
    affine = eff_scale is not None
    Cin = x.shape[-1]
    Cout = w.shape[-1]
    RC = w.shape[2]

    def _pad_affine(n):
        # identity on the pad lanes: affine(0) = 0·1 + 0, act(0) = 0
        nonlocal eff_scale, eff_bias
        if affine and eff_scale.shape[0] == RC:
            eff_scale = jnp.pad(eff_scale, (0, n), constant_values=1.0)
            eff_bias = jnp.pad(eff_bias, (0, n))

    if RC < Cin:
        _pad_affine(Cin - RC)
    elif RC in (32, 64) and not interpret:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - RC)))
        _pad_affine(128 - RC)
        Cin = 128
    if eff_scale is None:
        eff_scale = jnp.ones((Cin,), jnp.float32)
        eff_bias = jnp.zeros((Cin,), jnp.float32)
    # same-dtype MXU operands (mixed bf16xf32 matmuls don't lower); the cast
    # sits inside the autodiff graph so dw accumulates back to f32, exactly
    # like conv_apply's kernel.astype
    w = w.astype(x.dtype)
    H = x.shape[1]
    if H % 8 != 0:
        # row-pad to the sublane tile. Appended zero rows ARE the zero-SAME
        # halo for the last real row, so the cropped result is exact — but
        # only without a prologue (affine(0)=eff_bias would leak into the
        # halo) and without stats (they would count the pad rows).
        assert (pad_mode == "zero" and not affine and act is None
                and not stats and base is None), \
            "H%8 row-padding requires a plain zero-pad conv"
        hp = (8 - H % 8)
        xp = jnp.pad(x, ((0, 0), (0, hp), (0, 0), (0, 0)))
        y = _fused_conv(xp, w, eff_scale, eff_bias, None, affine, act,
                        False, False, interpret)
        return y[:, :H]
    return _fused_conv(x, w, eff_scale, eff_bias, base, affine,
                       act, pad_mode == "reflection", stats, interpret)


def fused_conv_supported(x_shape, k: int, stride: int,
                         allow_hpad: bool = False,
                         small_c: bool = True,
                         stats: bool = False) -> bool:
    """Shapes the Pallas path accepts (everything else -> conv_apply).

    C: lane-tile multiples, or small-C powers (32/64) that the kernel
    tap-groups onto full 128-wide MXU passes. Small-C operands ride as
    128-lane zero-padded arrays (Mosaic cannot DMA-slice a lane-padded
    HBM memref — "tpu.memref_slice ... 1x272x480x128 -> 1x9x480x64"
    hardware failure); fused_conv3x3 handles the padding, which costs no
    HBM bytes (a <128-ch tensor occupies full 128-lane tiles anyway).
    allow_hpad admits H not divisible by 8 — fused_conv3x3 zero-pads rows
    (zero-pad convs without prologue/stats only)."""
    if len(x_shape) != 4:
        return False
    n, H, W, C = x_shape
    c_ok = C % 128 == 0 or (small_c and C in (32, 64))
    h_ok = (H % 8 == 0 or allow_hpad) and H >= 64
    # W > 1024 routes through _fwd_pallas_cols: 8-aligned column windows
    # with 1-col overlap-discard, each running the fast 1-D banded kernel
    # (round 3; replaced the measured-slower _fwd_pallas_2d auto route).
    # Stats epilogues aren't stitched across windows -> no wide stats.
    w_ok = W % 8 == 0 and W >= 64 and (W <= 1024 or not stats)
    return n == 1 and k == 3 and stride == 1 and c_ok and h_ok and w_ok


@functools.lru_cache(maxsize=1)
def fused_conv_available() -> bool:
    """True when the default backend is a real TPU (incl. the tunneled
    'axon' platform) — the compiled Pallas path only lowers there."""
    try:
        d = jax.devices()[0]
        return d.platform in ("tpu", "axon") or "TPU" in str(
            getattr(d, "device_kind", ""))
    except Exception:
        return False
