"""Zero-seam batch folding: run batch-B zero-pad convs as batch-1, exactly.

The Pallas fused-conv family (ops/pallas_conv.py) is batch-1; the GAN
training convs are batch-8 (train_GAN.py:38-71, batch hardcoded 8 at
train_GAN.py:169). Folding (B,H,W,C) -> (1, B*(H+s), W, C) with s zero
"seam" rows appended to every image makes a batch-1 zero-pad conv EXACT on
every kept output row — not an approximation:

* stride 1, odd k, torch-style symmetric padding p=(k-1)//2: s = p seam
  rows suffice. Image i's outputs live at folded rows
  [i*(H+s), i*(H+s)+H); the s seam output rows per image mix neighboring
  images and are DROPPED by unfold_rows. Every kept output row's receptive
  field is own-image rows plus zero rows — identical to the zero-SAME halo
  of the unfolded conv.
* stride 2, k=3, p=1: s=2 preserves both the zero halo and the stride
  phase for even H (image offsets i*(H+2) stay even; output row j of
  image i reads folded rows i*(H+2)+2j-1 .. +2j+1, all own-image or seam).

The VJP is exact by construction: unfold_rows never reads the seam output
rows, so their cotangents are zero in the transposed conv and contribute
nothing to dgrad/wgrad; seam INPUT rows are zero, so wgrad picks up no
cross-image terms (image i's last kept row reads only own rows + seams).

This is the batch-enabling front end for the round-4 batched conv family
(DESIGN.md "Round-4 ammunition"); fold/unfold are whole-tensor reshapes
plus one row-pad — one cheap memory pass each.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_rows(x: jnp.ndarray, seam: int,
              fill: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B,H,W,C) -> (1, B*(H+seam), W, C) with `seam` rows appended to
    every image (the last image's seam rows double as bottom padding).

    fill (optional, (C,)): seam-row value instead of zero. Needed when the
    conv consuming the fold carries an affine+activation PROLOGUE
    (fused_conv3x3's eff_scale/eff_bias): a zero seam maps to
    act(eff_bias) != 0 inside the kernel and leaks into neighboring
    outputs' halos. fill = -eff_bias/eff_scale makes the prologue map seam
    rows to act(0) = 0 (exact for LeakyReLU/ELU/identity, which fix 0)."""
    b, h, w, c = x.shape
    if b == 1 and seam == 0:
        return x
    if fill is None:
        xp = jnp.pad(x, ((0, 0), (0, seam), (0, 0), (0, 0)))
    else:
        rows = jnp.broadcast_to(fill.astype(x.dtype), (b, seam, w, c))
        xp = jnp.concatenate([x, rows], axis=1)
    return xp.reshape(1, b * (h + seam), w, c)


def unfold_rows(y: jnp.ndarray, batch: int, out_h: int,
                stride: int = 1) -> jnp.ndarray:
    """Inverse of fold_rows after a stride-`stride` conv: slice each image's
    valid out_h rows, dropping the seam output rows.

    y: (1, batch*block, W, C) where block = (H+seam)//stride;
    returns (batch, out_h, W, C) with out_h = H//stride... (rows
    [i*block, i*block+out_h) per image)."""
    _, t, w, c = y.shape
    block = t // batch
    assert block * batch == t, (t, batch)
    assert block >= out_h, (block, out_h)
    return y.reshape(batch, block, w, c)[:, :out_h]


def fold_stats_correct(y_canvas: jnp.ndarray, stats: jnp.ndarray,
                       batch: int, out_h: int) -> jnp.ndarray:
    """Correct a fused-conv stats epilogue computed over a row-folded canvas.

    The kernel's (2, Cout) [sum, sum²] reduce ALL canvas rows, including the
    per-image seam OUTPUT rows (garbage: they mix neighboring images).
    Those are few (batch * seam rows); subtract their contribution directly.
    Returns stats over the valid rows only — what the following BatchNorm
    needs (its count must be batch*out_h*W, the caller's valid size)."""
    _, t, w, c = y_canvas.shape
    block = t // batch
    seam = y_canvas.reshape(batch, block, w, c)[:, out_h:]
    seam32 = seam.astype(jnp.float32)
    s1 = jnp.sum(seam32, axis=(0, 1, 2))
    s2 = jnp.sum(seam32 * seam32, axis=(0, 1, 2))
    return stats - jnp.stack([s1, s2])


def fold_stats_correct_grid(y_canvas: jnp.ndarray, stats: jnp.ndarray,
                            grid_h: int, grid_w: int, vh: int,
                            vw: int) -> jnp.ndarray:
    """Grid-canvas version of fold_stats_correct: subtract the seam region's
    contribution from a (2, C) [sum, sum²] epilogue. Seam region per cell =
    rows beyond vh (full cell width) + cols beyond vw within valid rows."""
    _, th, tw, c = y_canvas.shape
    ch, cw = th // grid_h, tw // grid_w
    yc = y_canvas.reshape(grid_h, ch, grid_w, cw, c)
    rows = yc[:, vh:].astype(jnp.float32)
    cols = yc[:, :vh, :, vw:].astype(jnp.float32)
    red = (0, 1, 2, 3)
    s1 = jnp.sum(rows, axis=red) + jnp.sum(cols, axis=red)
    s2 = jnp.sum(rows * rows, axis=red) + jnp.sum(cols * cols, axis=red)
    return stats - jnp.stack([s1, s2])


def seam_mask_rows(batch: int, block: int, valid: int) -> jnp.ndarray:
    """(1, batch*block, 1, 1) 0/1 mask: 1 on each image's valid rows, 0 on
    its seam rows — multiplied in after each folded layer's activation so
    cross-image garbage in seam OUTPUT rows never reaches the next conv."""
    import numpy as np

    m = np.zeros((batch, block, 1, 1), np.float32)
    m[:, :valid] = 1.0
    return jnp.asarray(m.reshape(1, batch * block, 1, 1))


def seam_mask_grid(grid_h: int, grid_w: int, ch: int, cw: int, vh: int,
                   vw: int) -> jnp.ndarray:
    """(1, grid_h*ch, grid_w*cw, 1) 0/1 mask over a grid canvas: 1 on each
    cell's valid vh x vw block, 0 on its seam rows/cols."""
    import numpy as np

    cell = np.zeros((ch, cw), np.float32)
    cell[:vh, :vw] = 1.0
    m = np.tile(cell, (grid_h, grid_w))
    return jnp.asarray(m[None, :, :, None])


def fold_seam(k: int, stride: int) -> int:
    """Seam rows needed for exactness of a folded zero-pad conv.

    stride 1: the halo depth p=(k-1)//2. stride 2 (k=3): 2, to keep image
    offsets on the stride grid for even H. Other (k, stride) combinations
    are not used by the SRGAN/DIP model zoo."""
    p = (k - 1) // 2
    if stride == 1:
        return p
    assert stride == 2 and k == 3, (k, stride)
    return 2


def fold_grid(x: jnp.ndarray, grid_h: int, grid_w: int, seam_h: int,
              seam_w: int) -> jnp.ndarray:
    """(B,H,W,C) -> (1, grid_h*(H+seam_h), grid_w*(W+seam_w), C): tile the
    batch on a 2-D canvas with zero seams in both axes.

    Small-spatial batches (the GAN G body at 24², D's late blocks at
    24²/48²) fold into one canvas that clears the Pallas kernels' W >= 64
    / W%8 constraints — e.g. 8 images of 24² with seam 8 -> (1, 64, 128, C)
    as grid 2x4. Corner exactness: a kept output pixel's receptive field
    crosses a seam in at least one axis before reaching any neighbor image,
    and seams are >= the halo depth, so cross-image terms are all zero."""
    b, h, w, c = x.shape
    assert b == grid_h * grid_w, (b, grid_h, grid_w)
    xp = jnp.pad(x, ((0, 0), (0, seam_h), (0, seam_w), (0, 0)))
    xp = xp.reshape(grid_h, grid_w, h + seam_h, w + seam_w, c)
    xp = xp.transpose(0, 2, 1, 3, 4)
    return xp.reshape(1, grid_h * (h + seam_h), grid_w * (w + seam_w), c)


def unfold_grid(y: jnp.ndarray, grid_h: int, grid_w: int, out_h: int,
                out_w: int) -> jnp.ndarray:
    """Inverse of fold_grid after a conv: slice each image's valid
    out_h x out_w block (top-left of its grid cell), restoring (B,...)."""
    _, t_h, t_w, c = y.shape
    bh, bw = t_h // grid_h, t_w // grid_w
    assert bh * grid_h == t_h and bw * grid_w == t_w, (y.shape, grid_h, grid_w)
    assert bh >= out_h and bw >= out_w, (bh, bw, out_h, out_w)
    y = y.reshape(grid_h, bh, grid_w, bw, c).transpose(0, 2, 1, 3, 4)
    return y.reshape(grid_h * grid_w, bh, bw, c)[:, :out_h, :out_w]


def folded_conv_apply(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                      pad_mode: str) -> jnp.ndarray:
    """conv_apply over the zero-seam fold; exact equal to the batched conv.

    Requires pad_mode='zero' (seam rows emulate zero padding only) and,
    for stride 2, even H. Measurement gate, not a default route: see
    tools/ab_fold_conv.py before wiring this into conv_apply."""
    from tpusr.models.layers import conv_apply

    assert pad_mode == "zero", "zero-seam folding is exact for zero pad only"
    b, h, _, _ = x.shape
    k = kernel.shape[0]
    if stride == 2:
        assert h % 2 == 0, "stride-2 fold needs even H for phase alignment"
    s = fold_seam(k, stride)
    y = conv_apply(fold_rows(x, s), kernel, stride, pad_mode)
    return unfold_rows(y, b, h // stride, stride)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(1,H,W,C) -> (1,H/2,W/2,4C), packed channel = py*2C + px*C + c.

    The front end of the stride-2-as-stride-1 route: a stride-2 k3 zero-pad
    conv over x equals a stride-1 k3 zero-pad conv over the packed tensor
    whose (3,3,4C,Cout) kernel (pack_s2_weights) is nonzero only at taps
    {0,1,3,4} — so the Pallas fused conv runs it in 4 MXU tap passes with
    K=4C (vs XLA's strided conv at the measured ~28% MXU)."""
    n, h, w, c = x.shape
    assert n == 1 and h % 2 == 0 and w % 2 == 0, x.shape
    x = x.reshape(h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(1, h // 2, w // 2, 4 * c)


S2_TAPS = (0, 1, 3, 4)  # live taps of a packed stride-2 kernel (t = 3a + b)


def pack_s2_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,Cout) -> (3,3,4C,Cout) matching space_to_depth2's packing.

    Output pixel (j,u) of the stride-2 conv reads original rows 2j-1..2j+1;
    packed row j-1+a holds originals 2(j-1+a)+py, so tap (a,b) of the packed
    kernel carries w[2a+py-1, 2b+px-1] on the (py,px) channel block — rows/
    cols that fall outside 0..2 (e.g. original row 2j-2) are zero, which
    leaves taps a=2, b=2 and the (a=0,py=0)/(b=0,px=0) blocks empty."""
    k, k2, c, co = w.shape
    assert k == 3 and k2 == 3, w.shape
    v = jnp.zeros((3, 3, 4 * c, co), w.dtype)
    for a in (0, 1):
        for py in (0, 1):
            r = 2 * a + py - 1
            if not 0 <= r <= 2:
                continue
            for b in (0, 1):
                for px in (0, 1):
                    s = 2 * b + px - 1
                    if not 0 <= s <= 2:
                        continue
                    blk = (py * 2 + px) * c
                    v = v.at[a, b, blk:blk + c].set(w[r, s])
    return v


def conv3x3_s2_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Stride-2 k3 zero-pad conv via space-to-depth + the 4-tap fused
    Pallas kernel. x: (1,H,W,C) with even H,W; exact equal to
    conv_apply(x, kernel, 2, 'zero')."""
    from tpusr.ops.pallas_conv import fused_conv3x3

    return fused_conv3x3(space_to_depth2(x), pack_s2_weights(kernel),
                         pad_mode="zero", taps=S2_TAPS, interpret=interpret)


def folded_conv_s2_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                          seam: int = 2,
                          interpret: bool = False) -> jnp.ndarray:
    """Batched stride-2 conv: zero-seam row fold -> packed 4-tap Pallas.

    seam must be even (stride-phase alignment); raising it beyond 2 can make
    the packed row count divide a larger VMEM row tile. Exact equal to
    conv_apply(x, kernel, 2, 'zero') for even H."""
    b, h, _, _ = x.shape
    assert h % 2 == 0 and seam % 2 == 0 and seam >= 2, (h, seam)
    y = conv3x3_s2_packed(fold_rows(x, seam), kernel, interpret=interpret)
    return unfold_rows(y, b, h // 2)


def folded_conv_s2_grid_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                               grid_h: int, grid_w: int, seam_h: int = 2,
                               seam_w: int = 2,
                               interpret: bool = False) -> jnp.ndarray:
    """Batched stride-2 conv over a 2-D grid fold (small-spatial layers
    whose packed W/2 would miss the kernel's width floor): fold -> packed
    4-tap Pallas -> unfold. Seams must be even and >= 2."""
    b, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, x.shape
    assert seam_h % 2 == 0 and seam_w % 2 == 0, (seam_h, seam_w)
    assert seam_h >= 2 and seam_w >= 2, (seam_h, seam_w)
    y = conv3x3_s2_packed(fold_grid(x, grid_h, grid_w, seam_h, seam_w),
                          kernel, interpret=interpret)
    return unfold_grid(y, grid_h, grid_w, h // 2, w // 2)


def folded_conv_grid(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                     pad_mode: str, grid_h: int, grid_w: int,
                     seam_h: int | None = None,
                     seam_w: int | None = None) -> jnp.ndarray:
    """conv_apply over a 2-D zero-seam grid fold; exact equal to the
    batched conv. Seams default to the minimal exact value (fold_seam) but
    may be raised (e.g. to make grid cells 8-aligned for the Pallas
    kernels). For stride 2, cells must start on the stride grid:
    (H+seam_h) and (W+seam_w) must be even (asserted)."""
    from tpusr.models.layers import conv_apply

    assert pad_mode == "zero", "zero-seam folding is exact for zero pad only"
    b, h, w, _ = x.shape
    k = kernel.shape[0]
    s = fold_seam(k, stride)
    seam_h = s if seam_h is None else seam_h
    seam_w = s if seam_w is None else seam_w
    assert seam_h >= s and seam_w >= s, (seam_h, seam_w, s)
    assert (h + seam_h) % stride == 0 and (w + seam_w) % stride == 0
    y = conv_apply(fold_grid(x, grid_h, grid_w, seam_h, seam_w), kernel,
                   stride, pad_mode)
    return unfold_grid(y, grid_h, grid_w, h // stride, w // stride)
