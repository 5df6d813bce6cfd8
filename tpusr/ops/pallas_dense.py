"""Line-buffer Pallas mega-kernel for the RRDB dense block (ESRGAN trunk).

Reference workload: the full-image eval path of /root/reference/eval_GAN.py:44
at ESRGAN scale (the BASELINE config-5 bench). Round-2 profile: the 23x3
dense blocks are ~137 ms of the 172 ms 2K frame and HBM-BOUND — the routed
per-conv path reads/writes every intermediate (px, c1..c4, p1..p4) to HBM,
~48 GB/frame of round-trips at 69 blocks/frame.

This kernel computes ONE WHOLE dense block per pallas_call: read x once,
write x + 0.2*c5 once. All nine intermediate tensors live only in VMEM.

Design (measured constraints from DESIGN.md + hardware probes):

* Line-buffer pipeline, NOT halo recompute: the 5 chained convs deepen the
  row halo to 5; recomputing it per tile costs 1.4-1.7x extra MXU passes.
  Instead the grid walks row tiles of TH=8 and each stage computes exactly
  TH fresh rows per step, reading the previous stage's trailing rows from
  ring-buffer scratch that persists across grid steps (TPU grids are
  sequential). Zero redundant compute; ring shifts are 2-5 row copies.
* Stage leads: at step i, stage s produces rows [i*TH + 4-s+1, ...+TH)
  (px/c1 lead 4, p1/c2 lead 3, ..., p4/c5 lead 0 = the output tile).
* Producer-packed weights (rrdb.DenseBlock packed=True layout): each
  source tensor gets ONE conv emitting all its consumers' slices, so MXU
  output columns stay >= 64 wide. Pending contributions to c2..c5
  accumulate in ring scratch ("pend" buffers) until their stage runs.
* Tap-grouping (ops/pallas_conv.py): C=64 inputs pack 2 shifted windows
  per 128-wide MXU pass, C=32 pack 4. N chunked at <=128 so f32
  accumulators stay bounded.
* Small-C ring layout: 32-channel rings pack 4 groups into one 128-lane
  scratch (lane-offset sub-tile stores/reads probed OK on hardware);
  per-group row windows differ by their stage lead, one uniform shift.
* Bottom edge: the logical image height H may be below the padded buffer
  HB; rows [H, HB) of the input are zero by contract and every stage
  multiplies by an iota row mask (int32 compare -> dtype, bf16-safe) so
  its out-of-image rows are exactly the zero padding the next conv needs.
  The output keeps the contract, so 69 blocks chain with ONE row/lane pad
  of the trunk feature map per frame.
* Top edge (step 0): a warmup branch computes every stage's lead rows with
  explicit zero top-halo rows and seeds the rings.

Autodiff: custom VJP whose backward recomputes via the XLA reference
(dense_block_reference) — the RRDB eval path never differentiates, training
RRDB is a beyond-reference extension and stays correct, just not
kernel-accelerated.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NF = 64   # trunk width
GC = 32   # growth
TH = 8    # row tile / pipeline advance per grid step


def _lrelu(a):
    # max/min form: bf16 vector compares don't lower on this target
    zero = jnp.zeros((), a.dtype)
    return jnp.maximum(a, zero) + jnp.asarray(0.2, a.dtype) * jnp.minimum(a, zero)


def _conv_chunks(a, wrefs, r_out, w_cols):
    """3x3 zero-SAME-column conv of value `a` (R_in, W, C) against packed
    kernel chunk refs [(9, C, N<=128), ...] -> [(r_out, W, N) dtype-of-a].

    Rows: emits r_out = R_in - 2 rows (valid in rows, the caller handles row
    halos). Columns: zero halos at the window edges (true image edges or
    discarded overlap columns). Taps grouped 128//C per MXU pass.
    """
    C = a.shape[-1]
    g = max(1, 128 // C)
    zc = jnp.zeros_like(a[:, 0:1])
    al = jnp.concatenate([zc, a[:, : w_cols - 1]], axis=1)   # dx = -1
    ar = jnp.concatenate([a[:, 1:], zc], axis=1)             # dx = +1
    taps = [(t // 3, (al, a, ar)[t % 3]) for t in range(9)]
    dn = (((2,), (0,)), ((), ()))
    outs = []
    for wr in wrefs:
        N = wr.shape[-1]
        acc = jnp.zeros((r_out, w_cols, N), jnp.float32)
        for t0 in range(0, 9, g):
            grp = taps[t0 : t0 + g]
            if len(grp) == 1:
                dy, src = grp[0]
                patch = src[dy : dy + r_out]
                wg = wr[t0]
            else:
                patch = jnp.concatenate(
                    [s[dy : dy + r_out] for dy, s in grp], axis=-1)
                wg = wr[pl.ds(t0, len(grp))].reshape(len(grp) * C, N)
            acc = acc + jax.lax.dot_general(
                patch, wg, dn, preferred_element_type=jnp.float32)
        outs.append(acc.astype(a.dtype))
    return outs


def _db_kernel(x_hbm, wxA, wxB, w1A, w1B, w2, w3, w4,
               b1, b2, b3, b4, b5, y_ref, xr, c1r, c2r, c3r, c4r, pa, p5,
               sem, *, W, HB, H, dtype):
    """One dense block, line-buffered. See module docstring for the schedule.

    Ring row maps (contents at the END of step i; r = ring row):
      xr (TH+5, W, 128): x[i*TH + r]
      c1r..c4r (TH+2, W, 32): c1[i*TH+2+r], c2[i*TH+1+r], c3[i*TH+r],
                         c4[i*TH-1+r] — four NARROW refs, not one packed
                         128-lane ring: conv inputs must read at lane
                         offset 0 (tpu.concatenate refuses offset mismatch
                         on non-concat dims, hit on hardware)
      pa (TH+3, W, 96):  pend2[i*TH+3+r], pend3[i*TH+2+r], pend4[i*TH+1+r]
      p5 (TH+4, W, 64):  pend5[i*TH+r]
    pendK row v = the already-computed producer contributions to conv K's
    pre-activation at row v (px/p1/... slices, bias not yet added).
    """
    i = pl.program_id(0)
    nt = HB // TH

    def dma(src_lo, n_rows, dst_lo):
        cp = pltpu.make_async_copy(x_hbm.at[0, pl.ds(src_lo, n_rows)],
                                   xr.at[pl.ds(dst_lo, n_rows)], sem)
        cp.start()
        cp.wait()

    b1v = b1[:].astype(dtype)
    b2v = b2[:].astype(dtype)
    b3v = b3[:].astype(dtype)
    b4v = b4[:].astype(dtype)
    b5v = b5[:].astype(dtype)
    z64 = jnp.zeros((TH, W, 64), dtype)

    # out-of-image row masks (bottom edge): row base + iota < H
    iota32 = jax.lax.broadcasted_iota(jnp.int32, (TH, W, GC), 0)

    def m32(base):
        return (iota32 + base < H).astype(dtype)

    # ---------------- warmup: step 0 seeds the rings, emits rows [0, TH) ---
    @pl.when(i == 0)
    def _():
        dma(0, TH + 5, 0)
        zrow64 = jnp.zeros((1, W, NF), dtype)
        zrow32 = jnp.zeros((1, W, GC), dtype)
        # px over x rows [-1, TH+5) -> rows [0, TH+4)
        xv = jnp.concatenate([zrow64, xr[0 : TH + 5, :, :NF]], axis=0)
        pxA, pxB = _conv_chunks(xv, [wxA, wxB], TH + 4, W)
        c1 = _lrelu(pxA[:, :, 0:GC] + b1v)                    # rows [0, TH+4)
        c1r[:] = c1[2 : TH + 4]
        pa[0 : TH + 1, :, 0:GC] = pxA[3 : TH + 4, :, GC : 2 * GC]
        pa[0 : TH + 2, :, GC : 2 * GC] = pxA[2 : TH + 4, :, 2 * GC : 3 * GC]
        pa[0 : TH + 3, :, 2 * GC : 3 * GC] = pxA[1 : TH + 4, :, 3 * GC :]
        p5[0 : TH + 4] = pxB
        # p1 over c1 rows [-1, TH+4) -> rows [0, TH+3)
        p1A, p1B = _conv_chunks(jnp.concatenate([zrow32, c1], axis=0),
                                [w1A, w1B], TH + 3, W)
        c2 = _lrelu(pxA[0 : TH + 3, :, GC : 2 * GC] + p1A[:, :, 0:GC] + b2v)
        c2r[:] = c2[1 : TH + 3]
        pa[0 : TH + 1, :, GC : 2 * GC] = (
            pa[0 : TH + 1, :, GC : 2 * GC] + p1A[2 : TH + 3, :, GC : 2 * GC])
        pa[0 : TH + 2, :, 2 * GC : 3 * GC] = (
            pa[0 : TH + 2, :, 2 * GC : 3 * GC]
            + p1A[1 : TH + 3, :, 2 * GC : 3 * GC])
        p1c5 = jnp.concatenate([p1A[:, :, 3 * GC :], p1B], axis=-1)
        p5[0 : TH + 3] = p5[0 : TH + 3] + p1c5
        # p2 over c2 rows [-1, TH+3) -> rows [0, TH+2)
        (p2,) = _conv_chunks(jnp.concatenate([zrow32, c2], axis=0),
                             [w2], TH + 2, W)
        c3 = _lrelu(pxA[0 : TH + 2, :, 2 * GC : 3 * GC]
                    + p1A[0 : TH + 2, :, GC : 2 * GC]
                    + p2[:, :, 0:GC] + b3v)
        c3r[:] = c3
        pa[0 : TH + 1, :, 2 * GC : 3 * GC] = (
            pa[0 : TH + 1, :, 2 * GC : 3 * GC]
            + p2[1 : TH + 2, :, GC : 2 * GC])
        p5[0 : TH + 2] = p5[0 : TH + 2] + p2[:, :, 2 * GC :]
        # p3 over c3 rows [-1, TH+2) -> rows [0, TH+1)
        (p3,) = _conv_chunks(jnp.concatenate([zrow32, c3], axis=0),
                             [w3], TH + 1, W)
        c4 = _lrelu(pxA[0 : TH + 1, :, 3 * GC :]
                    + p1A[0 : TH + 1, :, 2 * GC : 3 * GC]
                    + p2[0 : TH + 1, :, GC : 2 * GC]
                    + p3[:, :, 0:GC] + b4v)
        c4r[0:1] = jnp.zeros((1, W, GC), dtype)  # c4[-1] = top pad row
        c4r[1 : TH + 2] = c4
        p5[0 : TH + 1] = p5[0 : TH + 1] + p3[:, :, GC:]
        # p4 over c4 rows [-1, TH+1) -> rows [0, TH)
        (p4,) = _conv_chunks(jnp.concatenate([zrow32, c4], axis=0),
                             [w4], TH, W)
        c5 = p5[0:TH] + p4 + b5v
        y = xr[0:TH] + jnp.asarray(0.2, dtype) * jnp.concatenate(
            [c5, z64], axis=-1)
        y_ref[:] = y[None]

    # ---------------- steady state: shift rings, advance the pipeline ------
    @pl.when(i > 0)
    def _():
        base = i * TH
        # ring shifts (windows advance by TH)
        xr[0:5] = xr[TH : TH + 5]
        c1r[0:2] = c1r[TH : TH + 2]
        c2r[0:2] = c2r[TH : TH + 2]
        c3r[0:2] = c3r[TH : TH + 2]
        c4r[0:2] = c4r[TH : TH + 2]
        pa[0:3] = pa[TH : TH + 3]
        p5[0:4] = p5[TH : TH + 4]

        @pl.when(i < nt - 1)
        def _():
            dma(base + 5, TH, 5)

        @pl.when(i == nt - 1)
        def _():
            # only TH-5 rows remain below; rows >= HB are zero by contract
            dma(base + 5, TH - 5, 5)
            xr[TH:] = jnp.zeros((5, W, 128), dtype)

        # stage 1: px over x rows [base+3, base+TH+5) -> rows [base+4, ...)
        pxA, pxB = _conv_chunks(xr[3 : TH + 5, :, :NF], [wxA, wxB], TH, W)
        c1 = _lrelu(pxA[:, :, 0:GC] + b1v) * m32(base + 4)
        c1r[2 : TH + 2] = c1
        pa[1 : TH + 1, :, 0:GC] = pxA[:, :, GC : 2 * GC]
        pa[2 : TH + 2, :, GC : 2 * GC] = pxA[:, :, 2 * GC : 3 * GC]
        pa[3 : TH + 3, :, 2 * GC : 3 * GC] = pxA[:, :, 3 * GC :]
        p5[4 : TH + 4] = pxB
        # stage 2: p1 over c1 rows [base+2, base+TH+4) -> [base+3, ...)
        p1A, p1B = _conv_chunks(c1r[:], [w1A, w1B], TH, W)
        c2 = _lrelu(pa[0:TH, :, 0:GC] + p1A[:, :, 0:GC] + b2v) * m32(base + 3)
        c2r[2 : TH + 2] = c2
        pa[1 : TH + 1, :, GC : 2 * GC] = (
            pa[1 : TH + 1, :, GC : 2 * GC] + p1A[:, :, GC : 2 * GC])
        pa[2 : TH + 2, :, 2 * GC : 3 * GC] = (
            pa[2 : TH + 2, :, 2 * GC : 3 * GC] + p1A[:, :, 2 * GC : 3 * GC])
        p5[3 : TH + 3] = p5[3 : TH + 3] + jnp.concatenate(
            [p1A[:, :, 3 * GC :], p1B], axis=-1)
        # stage 3: p2 over c2 rows [base+1, base+TH+3) -> [base+2, ...)
        (p2,) = _conv_chunks(c2r[:], [w2], TH, W)
        c3 = _lrelu(pa[0:TH, :, GC : 2 * GC] + p2[:, :, 0:GC] + b3v) * m32(
            base + 2)
        c3r[2 : TH + 2] = c3
        pa[1 : TH + 1, :, 2 * GC : 3 * GC] = (
            pa[1 : TH + 1, :, 2 * GC : 3 * GC] + p2[:, :, GC : 2 * GC])
        p5[2 : TH + 2] = p5[2 : TH + 2] + p2[:, :, 2 * GC :]
        # stage 4: p3 over c3 rows [base, base+TH+2) -> [base+1, ...)
        (p3,) = _conv_chunks(c3r[:], [w3], TH, W)
        c4 = _lrelu(pa[0:TH, :, 2 * GC : 3 * GC] + p3[:, :, 0:GC]
                    + b4v) * m32(base + 1)
        c4r[2 : TH + 2] = c4
        p5[1 : TH + 1] = p5[1 : TH + 1] + p3[:, :, GC:]
        # stage 5: p4 over c4 rows [base-1, base+TH+1) -> [base, base+TH)
        (p4,) = _conv_chunks(c4r[:], [w4], TH, W)
        c5 = p5[0:TH] + p4 + b5v
        ymask = (jax.lax.broadcasted_iota(jnp.int32, (TH, W, 128), 0)
                 + base < H).astype(dtype)
        y = (xr[0:TH] + jnp.asarray(0.2, dtype) * jnp.concatenate(
            [c5, z64], axis=-1)) * ymask
        y_ref[:] = y[None]


def pack_weights(kernels):
    """Producer-packed chunk layout from the 5 canonical ESRGAN kernels.

    kernels: [k1 (3,3,64,32), k2 (3,3,96,32), k3 (3,3,128,32),
              k4 (3,3,160,32), k5 (3,3,192,64)]  (parity:
              models/GAN-style ESRGAN layout, rrdb.DenseBlock params).
    Returns 7 arrays reshaped (9, C, N): wxA, wxB, w1A, w1B, w2, w3, w4.
    """
    k1, k2, k3, k4, k5 = kernels

    def r9(a):
        return a.reshape(9, a.shape[2], a.shape[3])

    wxA = jnp.concatenate(
        [k1, k2[:, :, :NF], k3[:, :, :NF], k4[:, :, :NF]], axis=-1)
    wxB = k5[:, :, :NF]
    nf1 = NF + GC
    w1 = jnp.concatenate([k2[:, :, NF:], k3[:, :, NF:nf1],
                          k4[:, :, NF:nf1], k5[:, :, NF:nf1]], axis=-1)
    w1A, w1B = w1[..., :128], w1[..., 128:]
    nf2 = NF + 2 * GC
    w2 = jnp.concatenate([k3[:, :, nf1:], k4[:, :, nf1:nf2],
                          k5[:, :, nf1:nf2]], axis=-1)
    nf3 = NF + 3 * GC
    w3 = jnp.concatenate([k4[:, :, nf2:], k5[:, :, nf2:nf3]], axis=-1)
    w4 = k5[:, :, nf3:]
    return tuple(r9(a) for a in (wxA, wxB, w1A, w1B, w2, w3, w4))


def dense_block_reference(x, kernels, biases):
    """XLA reference: the canonical 5-conv dense block on (1,H,W,64).

    Matches rrdb.DenseBlock(packed=False) math; used for the custom-VJP
    backward, the golden tests, and unsupported-shape fallbacks."""
    k1, k2, k3, k4, k5 = [k.astype(x.dtype) for k in kernels]
    b1, b2, b3, b4, b5 = [b.astype(x.dtype) for b in biases]
    dn = ("NHWC", "HWIO", "NHWC")

    def c(a, k):
        ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.lax.conv_general_dilated(ap, k, (1, 1), "VALID",
                                            dimension_numbers=dn)

    def lr(a):
        return jnp.where(a >= 0, a, jnp.asarray(0.2, a.dtype) * a)

    c1 = lr(c(x, k1) + b1)
    c2 = lr(c(jnp.concatenate([x, c1], -1), k2) + b2)
    c3 = lr(c(jnp.concatenate([x, c1, c2], -1), k3) + b3)
    c4 = lr(c(jnp.concatenate([x, c1, c2, c3], -1), k4) + b4)
    c5 = c(jnp.concatenate([x, c1, c2, c3, c4], -1), k5) + b5
    return x + jnp.asarray(0.2, x.dtype) * c5


# ------------------------------------------------------------- planning
_VMEM_BUDGET = int(os.environ.get("TPUSR_DENSE_VMEM_MB", "13")) * 2**20


def _peak_bytes(w_cols, isz):
    scr = (7 * TH + 44) * w_cols * 128 * isz  # xr + 4 narrow c + pa + p5
    trans = (TH * w_cols * 128 * 4                    # f32 dot accumulator
             + 2 * TH * w_cols * 256 * isz            # px chunks + c values
             + 3 * (TH + 2) * w_cols * 128 * isz)     # al/am/ar shift copies
    # calibrated on hardware: a 248-col window allocated 16.43 MB scoped
    # VMEM against an 11.25 MB estimate (Mosaic temporaries) — scale 1.5x
    return scr + trans * 3 // 2


def _col_plan(W, isz):
    """Split W into output col ranges whose kernel windows fit VMEM.

    Returns [(in_lo, in_hi, keep_lo, keep_hi)] — kernel runs on x cols
    [in_lo, in_hi) and keeps output cols [keep_lo, keep_hi) of that window
    (5-deep col halos discarded at interior seams, chain depth of 5 convs).
    """
    n = 1
    while True:
        ow = -(-W // n)           # ceil
        ow = -(-ow // 8) * 8      # round tile width up to sublane multiple
        if _peak_bytes(min(W, ow + 16), isz) <= _VMEM_BUDGET or ow <= 64:
            break
        n += 1
    if n == 1:
        return [(0, W, 0, W)]
    tiles = []
    o0 = 0
    while o0 < W:
        o1 = min(W, o0 + ow)
        il = max(0, o0 - 5)
        ir = min(W, o1 + 5)
        d = (-(ir - il)) % 8
        if il >= d:
            il -= d
        else:
            ir = min(W, ir + d)
            d2 = (-(ir - il)) % 8
            il -= d2  # W % 8 == 0 guarantees this stays >= 0
        tiles.append((il, ir, o0 - il, o1 - il))
        o0 = o1
    return tiles


def dense_line_supported(padded_shape, logical_h) -> bool:
    """Shapes the line-buffer kernel accepts (else dense_block_reference)."""
    if len(padded_shape) != 4:
        return False
    n, HB, W, C = padded_shape
    return (n == 1 and C == 128 and HB % TH == 0 and HB >= 2 * TH
            and logical_h >= TH + 5 and logical_h <= HB
            and W % 8 == 0 and 64 <= W)


@functools.lru_cache(maxsize=1)
def dense_line_available() -> bool:
    from tpusr.ops.pallas_conv import fused_conv_available

    return fused_conv_available()


def _run_kernel(xp, packed, biases, img_h, interpret):
    _, HB, W, _ = xp.shape
    dtype = xp.dtype
    kern = functools.partial(_db_kernel, W=W, HB=HB, H=img_h, dtype=dtype)
    grid = (HB // TH,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]       # x stays in HBM
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_shape=jax.ShapeDtypeStruct((1, HB, W, 128), dtype),
        out_specs=pl.BlockSpec((1, TH, W, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 5, W, 128), dtype),   # xr
            pltpu.VMEM((TH + 2, W, GC), dtype),    # c1r
            pltpu.VMEM((TH + 2, W, GC), dtype),    # c2r
            pltpu.VMEM((TH + 2, W, GC), dtype),    # c3r
            pltpu.VMEM((TH + 2, W, GC), dtype),    # c4r
            pltpu.VMEM((TH + 3, W, 96), dtype),    # pa: pend2|pend3|pend4
            pltpu.VMEM((TH + 4, W, 64), dtype),    # p5: pend5
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, *packed, *biases)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _dense_line(img_h, interpret, xp, kernels, biases):
    packed = [w.astype(xp.dtype) for w in pack_weights(kernels)]
    bias32 = [b.astype(jnp.float32) for b in biases]
    _, HB, W, _ = xp.shape
    tiles = _col_plan(W, xp.dtype.itemsize)
    if len(tiles) == 1:
        return _run_kernel(xp, packed, bias32, img_h, interpret)
    outs = []
    for il, ir, kl, kh in tiles:
        y = _run_kernel(xp[:, :, il:ir], packed, bias32, img_h, interpret)
        outs.append(y[:, :, kl:kh])
    return jnp.concatenate(outs, axis=2)


def _dense_line_fwd(img_h, interpret, xp, kernels, biases):
    return _dense_line(img_h, interpret, xp, kernels, biases), (
        xp, kernels, biases)


def _dense_line_bwd(img_h, interpret, res, g):
    # recompute via the XLA reference on the unpadded view; pad/slice
    # adjoints restore the padded-layout cotangent
    xp, kernels, biases = res

    def ref(xp_, ks, bs):
        y = dense_block_reference(xp_[:, :, :, :NF], ks, bs)
        return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 128 - NF)))

    _, vjp = jax.vjp(ref, xp, kernels, biases)
    return vjp(g)


_dense_line.defvjp(_dense_line_fwd, _dense_line_bwd)


def dense_block_line(xp, kernels, biases, img_h, *, interpret=False):
    """One RRDB dense block on a lane/row-padded trunk tensor.

    xp: (1, HB, W, 128) — lanes [64:128) zero, rows [img_h, HB) zero.
    kernels/biases: the 5 canonical per-conv params (f32, any compute dtype
    on xp). Returns (1, HB, W, 128) = xp + 0.2*c5 with the same padding
    contract, so 69 blocks chain without intermediate pad copies.
    """
    assert dense_line_supported(xp.shape, img_h)
    return _dense_line(img_h, interpret, xp, tuple(kernels), tuple(biases))
