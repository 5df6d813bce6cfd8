"""Folded SRGAN training dataflows: G and D conv stacks as batch-1
zero-seam canvases through the fused Pallas conv family.

Reference workload: ``do_epoch`` (train_GAN.py:38-71) at batch 8
(hardcoded, train_GAN.py:169) on 192² HR patches (discriminator.py:21-74 /
generator.py:44-81 topologies). The flax modules (models/srgan.py) remain
the source of truth for parameters, eval, and checkpoints; this module
re-executes the SAME math as folded dataflows:

  * the batch rides zero-seam canvases (ops/batch_fold.py), so every conv
    is batch-1 and Pallas-reachable; stride-2 convs run as 4-tap stride-1
    convs over a 2x2 space-to-depth packing (K = 4C MXU passes);
  * each conv's kernel reduces per-channel sum/sum² in its epilogue, so
    BatchNorm never re-reads the tensor;
  * v1 (``discriminator_apply_folded`` / ``generator_apply_folded``):
    BN normalize + activation + seam re-zeroing fuse into ONE elementwise
    pass between convs (the seam mask multiply restores exact zero seams,
    which is what makes staying folded exact layer after layer), with
    seam sums subtracted from the epilogue stats outside the kernel;
  * v2 (``discriminator_apply_folded_v2``): ZERO inter-layer passes — the
    BN affine + LeakyReLU ride the NEXT conv's in-kernel prologue, seams
    are masked in-kernel (iota row/col masks), and the stats epilogue is
    seam-exact, so between convs nothing touches the tensor;
  * spatial dims halve at each stride-2 block, so the canvas is refolded
    (rows -> 2xN grids) as needed to keep W inside the kernels' sublane
    constraints; refolds are cheap reshape+pad passes on shrinking
    tensors, and they chain exactly (they slice only valid regions).

Exactness (fwd, grads, and BN running stats) is golden-tested against the
flax modules in tests/test_srgan_folded.py (aggregate grad tolerances —
see the chaos-floor note there and in DESIGN.md). Routing is
measurement-gated: engine/gan.py consults TPUSR_D_FOLD / TPUSR_G_FOLD
(default off) and the full-step A/B decides (tools/ab_d_fold.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from tpusr.models.layers import conv_apply, leaky_relu, pixel_shuffle
from tpusr.ops.batch_fold import (S2_TAPS, fold_grid, fold_rows,
                                  fold_stats_correct,
                                  fold_stats_correct_grid, pack_s2_weights,
                                  seam_mask_grid, seam_mask_rows,
                                  space_to_depth2, unfold_grid, unfold_rows)
from tpusr.ops.pallas_conv import fused_conv3x3

# D schedule after the stem (discriminator.py:29-35)
_SCHEDULE = [(64, 2), (128, 1), (128, 2), (256, 1), (256, 2), (512, 1),
             (512, 2)]


def folded_d_supported(x_shape) -> bool:
    """Shapes this dataflow covers: the reference training geometry class
    (square patches, 16-divisible so all three refold stages stay even for
    space-to-depth, batch even for the 2xN refold grids)."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (c == 3 and h == w and h % 16 == 0 and h >= 64
            and b % 2 == 0 and b >= 4)


def _bn_act_mask(y, stats2c, n, cb, scale, bias, ra_mean, ra_var, train,
                 mask, act=lambda z: leaky_relu(z, 0.2)):
    """BatchNorm (torch semantics, models/layers.py:293-367 conv_stats
    branch) + activation + seam re-zero as one fused elementwise pass.

    y is the BIAS-FREE conv output canvas; stats2c = seam-corrected
    [sum, sum²] over the n valid positions; cb = the conv bias, folded
    into the affine exactly (mean(y+cb) = sum/n + cb, var shift-invariant).
    act: elementwise callable or None (the D uses LeakyReLU(0.2), the G's
    res blocks PReLU / identity). Returns (z, new_ra_mean, new_ra_var)."""
    es, eb, new_mean, new_var = _bn_affine_from_stats(
        stats2c, n, cb, scale, bias, ra_mean, ra_var, train)
    z = y * es.astype(y.dtype) + eb.astype(y.dtype)
    if act is not None:
        z = act(z)
    if mask is not None:
        z = z * mask.astype(z.dtype)
    return z, new_mean, new_var


def _bn_affine_from_stats(stats2c, n, cb, scale, bias, ra_mean, ra_var,
                          train, eps=1e-5, momentum=0.1):
    """BatchNorm affine (torch semantics) from seam-exact conv-epilogue
    stats of the BIAS-FREE output, with the conv bias cb folded in.
    Returns (eff_scale, eff_bias, new_ra_mean, new_ra_var) — the affine is
    meant for the NEXT conv's in-kernel prologue (v2 dataflow)."""
    if train:
        m_raw = stats2c[0] / n
        var = jnp.maximum(stats2c[1] / n - jnp.square(m_raw), 0.0)
        mean = m_raw + cb
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - momentum) * ra_mean + momentum * mean
        new_var = (1 - momentum) * ra_var + momentum * unbiased
        use_mean, use_var = mean, var
    else:
        new_mean, new_var = ra_mean, ra_var
        use_mean, use_var = ra_mean, ra_var
    inv = jax.lax.rsqrt(use_var + eps)
    es = inv * scale
    eb = bias - (use_mean - cb) * inv * scale
    return es, eb, new_mean, new_var


def discriminator_apply_folded_v2(params, batch_stats, x, train: bool = True,
                                  dtype: Any = None,
                                  interpret: bool = False):
    """The v2 folded D: like discriminator_apply_folded, but with ZERO
    inter-layer elementwise passes — each conv kernel applies the previous
    BN's affine + LeakyReLU as its prologue and masks the canvas seams
    in-kernel (iota row/col masks), and its stats epilogue is seam-exact,
    so BatchNorm never touches the tensor at all. The stem's bias+LeakyReLU
    ride b0's prologue the same way (es=1, eb=stem bias).

    Canvas values BETWEEN convs are raw bias-free conv outputs (garbage on
    seams — masked at the consumer); refolds slice only valid regions, so
    they chain exactly. Gated via TPUSR_D_FOLD=2 (=2i interpret)."""
    b, hr, _, _ = x.shape
    assert folded_d_supported(x.shape), x.shape
    gh, gw = 2, b // 2
    if dtype is not None:
        x = x.astype(dtype)
    cdtype = x.dtype

    def conv_w(name):
        p = params[name]
        return p["kernel"].astype(cdtype), p["bias"]

    new_stats = {}

    # ---- stage A: row fold; stem conv stays XLA (thin Cin), bias/act
    # deferred into b0's prologue ----
    blk = hr + 4
    xf = fold_rows(x, 4)
    kw, kb = conv_w("conv")
    z = conv_apply(xf, kw, 1, "zero")          # RAW: no bias, no act
    es = jnp.ones((64,), jnp.float32)
    eb = kb.astype(jnp.float32)

    stage, vh, vw = "rows", hr, hr

    for i, (ch, st) in enumerate(_SCHEDULE):
        if st == 2 and i > 0:
            if stage == "rows":
                z = unfold_rows(z, b, vh)
            else:
                z = unfold_grid(z, gh, gw, vh, vw)
            z = fold_grid(z, gh, gw, 8, 8)
            stage, vw = "grid", vh
            blk = vh + 8

        kw, kb = conv_w(f"block{i}_conv")
        if stage == "rows":
            bw_s, vw_s = z.shape[2], z.shape[2]  # no column seams
        else:
            bw_s, vw_s = blk, vw
        if st == 2:
            xin = space_to_depth2(z)
            spec = (blk // 2, vh // 2, bw_s // 2 if stage == "grid"
                    else xin.shape[2], vw_s // 2 if stage == "grid"
                    else xin.shape[2])
            y, st2 = fused_conv3x3(
                xin, pack_s2_weights(kw), jnp.tile(es, 4), jnp.tile(eb, 4),
                act="leaky_relu", pad_mode="zero", stats=True, taps=S2_TAPS,
                interpret=interpret, seam=spec)
            vh, vw, blk = vh // 2, vw // 2, blk // 2
        else:
            spec = (blk, vh, bw_s, vw_s)
            y, st2 = fused_conv3x3(z, kw, es, eb, act="leaky_relu",
                                   pad_mode="zero", stats=True,
                                   interpret=interpret, seam=spec)

        bn = params[f"block{i}_bn"]
        ra = batch_stats[f"block{i}_bn"]
        es, eb, nm, nv = _bn_affine_from_stats(
            st2, b * vh * vw, kb, bn["scale"], bn["bias"], ra["mean"],
            ra["var"], train)
        new_stats[f"block{i}_bn"] = {"mean": nm, "var": nv}
        z = y

    # last BN + act explicitly (no next conv to carry them)
    z = z * es.astype(cdtype) + eb.astype(cdtype)
    z = leaky_relu(z, 0.2)
    z = unfold_grid(z, gh, gw, vh, vw)

    z = z.reshape(b, -1)
    d1 = params["dense1"]["Dense_0"]
    z = z @ d1["kernel"].astype(cdtype) + d1["bias"].astype(cdtype)
    z = leaky_relu(z, 0.2)
    d2 = params["dense2"]["Dense_0"]
    logits = z @ d2["kernel"].astype(cdtype) + d2["bias"].astype(cdtype)
    return logits.astype(jnp.float32), new_stats


def folded_g_supported(x_shape, factor: int) -> bool:
    """LR-patch shapes the folded generator covers: square, p%4==0 (the
    (p+4)-cell grid must keep the canvas sublane-aligned), even batch, a
    power-of-two factor, and a wide-enough first canvas — the fused convs
    need W >= 64 and W%8 (the reference workload, B=8 p=24, gives 112)."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    if not (c == 3 and h == w and h % 4 == 0 and b % 2 == 0 and b >= 4
            and factor in (2, 4, 8, 16)):
        return False
    w0 = (b // 2) * (h + 4)
    return w0 >= 64 and w0 % 8 == 0 and (2 * (h + 4)) % 8 == 0


def _prelu(alpha):
    def act(z):
        a = alpha.astype(z.dtype)
        return jnp.where(z >= 0, z, a * z)
    return act


def generator_apply_folded(params, batch_stats, x, factor: int,
                           n_blocks: int, train: bool = True,
                           dtype: Any = None, interpret: bool = False,
                           chain: bool = False):
    """Drop-in for ``Generator.apply`` on (B, p, p, 3) LR training patches.

    The whole G runs as ONE zero-seam 2xN grid canvas: conv1 (9x9, seam-4
    cells) -> 16 residual blocks through the fused Pallas convs with
    BN-stats epilogues -> long skip -> shuffle blocks (pixel_shuffle keeps
    a folded canvas folded: cells/seams/valid all double) with a minimal
    refold after each non-final shuffle to shed seam growth -> 9x9 head
    via the thin-Cout GEMM on the canvas. PReLU fixes 0, so seams stay
    zero through activations; each BN re-zeros them in its fused
    elementwise pass. Returns (sr (B,P,P,3) f32, new_batch_stats).

    chain=True (TPUSR_G_FOLD=2): the intra-block BN1 affine + PReLU ride
    conv2's in-kernel prologue and every stats epilogue is seam-exact
    in-kernel (seam specs), so each residual block costs two kernels plus
    ONE elementwise pass (BN2 affine + residual add + seam re-zero)."""
    b, p, _, _ = x.shape
    assert folded_g_supported(x.shape, factor), (x.shape, factor)
    n_shuffles = {2: 1, 4: 2, 8: 3, 16: 4}[factor]
    gh, gw = 2, b // 2
    if dtype is not None:
        x = x.astype(dtype)
    cdtype = x.dtype
    new_stats = {}

    def conv_w(tree, name):
        pr = tree[name]
        return pr["kernel"].astype(cdtype), pr["bias"]

    def bn_step(y, st2, v, kb, bn_name, tree, stats_tree, act, mask):
        bn = tree[bn_name]
        ra = stats_tree[bn_name]
        z, nm, nv = _bn_act_mask(y, st2, b * v * v, kb, bn["scale"],
                                 bn["bias"], ra["mean"], ra["var"], train,
                                 mask, act=act)
        return z, {"mean": nm, "var": nv}

    # ---- fold + conv1 (9x9; seam 4 covers its halo) ----
    v, cells = p, p + 4
    z = fold_grid(x, gh, gw, 4, 4)
    kw, kb = conv_w(params, "conv1")
    z = conv_apply(z, kw, 1, "zero") + kb.astype(cdtype)
    z = _prelu(params["prelu1"]["alpha"])(z)
    mask = seam_mask_grid(gh, gw, cells, cells, v, v).astype(cdtype)
    x0 = z * mask

    # ---- residual blocks (fused convs + epilogue stats) ----
    spec = (cells, v, cells, v) if chain else None
    n = b * v * v
    z = x0
    for i in range(n_blocks):
        rp = params[f"res{i}"]
        rs = batch_stats[f"res{i}"]
        ns = {}
        kw, kb = conv_w(rp, "conv1")
        y, st2 = fused_conv3x3(z, kw, pad_mode="zero", stats=True,
                               interpret=interpret, seam=spec)
        if chain:
            # BN1 affine + PReLU ride conv2's prologue; stats seam-exact
            es, eb, nm, nv = _bn_affine_from_stats(
                st2, n, kb, rp["bn1"]["scale"], rp["bn1"]["bias"],
                rs["bn1"]["mean"], rs["bn1"]["var"], train)
            ns["bn1"] = {"mean": nm, "var": nv}
            kw, kb = conv_w(rp, "conv2")
            y, st2 = fused_conv3x3(y, kw, es, eb, act="prelu",
                                   prelu_alpha=rp["prelu1"]["alpha"],
                                   pad_mode="zero", stats=True,
                                   interpret=interpret, seam=spec)
            es, eb, nm, nv = _bn_affine_from_stats(
                st2, n, kb, rp["bn2"]["scale"], rp["bn2"]["bias"],
                rs["bn2"]["mean"], rs["bn2"]["var"], train)
            ns["bn2"] = {"mean": nm, "var": nv}
            # BN2 affine + residual add + seam re-zero: one fused pass
            z = (z + y * es.astype(cdtype) + eb.astype(cdtype)) * mask
        else:
            st2 = fold_stats_correct_grid(y, st2, gh, gw, v, v)
            h, ns["bn1"] = bn_step(y, st2, v, kb, "bn1", rp, rs,
                                   _prelu(rp["prelu1"]["alpha"]), mask)
            kw, kb = conv_w(rp, "conv2")
            y, st2 = fused_conv3x3(h, kw, pad_mode="zero", stats=True,
                                   interpret=interpret)
            st2 = fold_stats_correct_grid(y, st2, gh, gw, v, v)
            h, ns["bn2"] = bn_step(y, st2, v, kb, "bn2", rp, rs, None, mask)
            z = z + h
        new_stats[f"res{i}"] = ns

    # ---- conv2 + bn1 + long skip (generator.py:70-74) ----
    kw, kb = conv_w(params, "conv2")
    y, st2 = fused_conv3x3(z, kw, pad_mode="zero", stats=True,
                           interpret=interpret, seam=spec)
    if chain:
        es, eb, nm, nv = _bn_affine_from_stats(
            st2, n, kb, params["bn1"]["scale"], params["bn1"]["bias"],
            batch_stats["bn1"]["mean"], batch_stats["bn1"]["var"], train)
        new_stats["bn1"] = {"mean": nm, "var": nv}
        z = (x0 + y * es.astype(cdtype) + eb.astype(cdtype)) * mask
    else:
        st2 = fold_stats_correct_grid(y, st2, gh, gw, v, v)
        z, new_stats["bn1"] = bn_step(y, st2, v, kb, "bn1", params,
                                      batch_stats, None, mask)
        z = x0 + z

    # ---- shuffle blocks; refold after each non-final shuffle ----
    for i in range(n_shuffles):
        sp = params[f"ps{i}"]
        kw, kb = conv_w(sp, "conv1")
        y = fused_conv3x3(z, kw, pad_mode="zero", stats=False,
                          interpret=interpret)
        y = (y + kb.astype(cdtype)) * mask
        y = pixel_shuffle(y, 2)
        z = _prelu(sp["prelu1"]["alpha"])(y)
        v, cells = 2 * v, 2 * cells
        if i < n_shuffles - 1:
            z = unfold_grid(z, gh, gw, v, v)
            z = fold_grid(z, gh, gw, 4, 4)
            cells = v + 4
        mask = seam_mask_grid(gh, gw, cells, cells, v, v).astype(cdtype)

    # ---- 9x9 head via the thin-Cout canvas GEMM + unfold + tanh ----
    kw, kb = conv_w(params, "conv3")
    z = conv_apply(z, kw, 1, "zero") + kb.astype(cdtype)
    z = unfold_grid(z, gh, gw, v, v)
    return jnp.tanh(z.astype(jnp.float32)), new_stats


def fused_g_eval_supported(x_shape, factor: int) -> bool:
    """Full-image eval shapes the fused generator covers: batch 1, H/W
    sublane-aligned and wide enough for the kernels, and the widest
    shuffle-conv input still inside the 1-D kernel's column budget."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    n_shuffles = {2: 1, 4: 2, 8: 3, 16: 4}.get(factor)
    if n_shuffles is None or b != 1 or c != 3:
        return False
    return (h % 8 == 0 and w % 8 == 0 and h >= 64 and w >= 64
            and w * 2 ** (n_shuffles - 1) <= 1024)


def generator_apply_fused_eval(params, batch_stats, x, factor: int,
                               n_blocks: int, dtype: Any = None,
                               interpret: bool = False):
    """Fused full-image generator EVAL forward (eval_GAN.py:44 workload).

    With running-stats BatchNorm the affines are static per checkpoint, so
    each residual block runs as two fused kernels plus ONE elementwise
    pass: conv1 plain -> conv2 with the BN1-affine + PReLU prologue
    in-kernel -> (BN2 affine + residual add) fused by XLA. The long skip
    works the same; shuffle convs run fused with bias+shuffle+PReLU as one
    XLA pass; the 9x9 head rides the thin-Cout GEMM. Gated via
    TPUSR_G_FUSE=2 in engine/gan.py (measurement: tools/ab_g_fuse.py)."""
    assert fused_g_eval_supported(x.shape, factor), (x.shape, factor)
    n_shuffles = {2: 1, 4: 2, 8: 3, 16: 4}[factor]
    if dtype is not None:
        x = x.astype(dtype)
    cdtype = x.dtype

    def conv_w(tree, name):
        pr = tree[name]
        return pr["kernel"].astype(cdtype), pr["bias"]

    def bn_eval_affine(tree, stats_tree, name, cb):
        es, eb, _, _ = _bn_affine_from_stats(
            None, 1, cb, tree[name]["scale"], tree[name]["bias"],
            stats_tree[name]["mean"], stats_tree[name]["var"], train=False)
        return es, eb

    kw, kb = conv_w(params, "conv1")
    z = conv_apply(x, kw, 1, "zero") + kb.astype(cdtype)
    x0 = _prelu(params["prelu1"]["alpha"])(z)

    z = x0
    for i in range(n_blocks):
        rp = params[f"res{i}"]
        rs = batch_stats[f"res{i}"]
        kw, kb = conv_w(rp, "conv1")
        y1 = fused_conv3x3(z, kw, pad_mode="zero", interpret=interpret)
        es, eb = bn_eval_affine(rp, rs, "bn1", kb)
        kw, kb = conv_w(rp, "conv2")
        y2 = fused_conv3x3(y1, kw, es, eb, act="prelu",
                           prelu_alpha=rp["prelu1"]["alpha"],
                           pad_mode="zero", interpret=interpret)
        es, eb = bn_eval_affine(rp, rs, "bn2", kb)
        z = z + y2 * es.astype(cdtype) + eb.astype(cdtype)

    kw, kb = conv_w(params, "conv2")
    y = fused_conv3x3(z, kw, pad_mode="zero", interpret=interpret)
    es, eb = bn_eval_affine(params, batch_stats, "bn1", kb)
    z = x0 + y * es.astype(cdtype) + eb.astype(cdtype)

    for i in range(n_shuffles):
        sp = params[f"ps{i}"]
        kw, kb = conv_w(sp, "conv1")
        y = fused_conv3x3(z, kw, pad_mode="zero", interpret=interpret)
        y = pixel_shuffle(y + kb.astype(cdtype), 2)
        z = _prelu(sp["prelu1"]["alpha"])(y)

    kw, kb = conv_w(params, "conv3")
    z = conv_apply(z, kw, 1, "zero") + kb.astype(cdtype)
    return jnp.tanh(z.astype(jnp.float32))


def discriminator_apply_folded(params, batch_stats, x, train: bool = True,
                               dtype: Any = None, interpret: bool = False):
    """Drop-in for ``Discriminator.apply`` on (B, P, P, 3) HR patches.

    params / batch_stats: the flax Discriminator trees (same names).
    Returns (logits (B,1) float32, new_batch_stats)."""
    b, hr, _, _ = x.shape
    assert folded_d_supported(x.shape), x.shape
    gh, gw = 2, b // 2
    if dtype is not None:
        x = x.astype(dtype)
    cdtype = x.dtype

    def conv_w(name):
        p = params[name]
        return p["kernel"].astype(cdtype), p["bias"]

    new_stats = {}

    # ---- stage A: row fold (seam 4 keeps the stride-2 phase; block P+4) --
    block_a = hr + 4
    xf = fold_rows(x, 4)                       # (1, B*(P+4), P, 3)
    kw, kb = conv_w("conv")
    z = conv_apply(xf, kw, 1, "zero") + kb.astype(cdtype)
    z = leaky_relu(z, 0.2)
    z = z * seam_mask_rows(b, block_a, hr).astype(cdtype)

    stage = "rows"           # current fold kind
    vh = vw = hr             # valid spatial dims of the canvas cells
    blk = block_a            # rows-stage block height

    for i, (ch, st) in enumerate(_SCHEDULE):
        # refold to a fresh 2xN grid when the rows-stage W or the inherited
        # grid cells would leave the Pallas family's sublane constraints
        # (stage boundaries: before b2 / b4 / b6 — i.e. every s2 block
        # after the first)
        if st == 2 and i > 0:
            if stage == "rows":
                z = unfold_rows(z, b, vh)
            else:
                z = unfold_grid(z, gh, gw, vh, vw)
            z = fold_grid(z, gh, gw, 8, 8)
            stage, vw = "grid", vh
            blk = vh + 8

        kw, kb = conv_w(f"block{i}_conv")
        if st == 2:
            xin = space_to_depth2(z)
            y, st2 = fused_conv3x3(xin, pack_s2_weights(kw), pad_mode="zero",
                                   stats=True, taps=S2_TAPS,
                                   interpret=interpret)
            vh, vw, blk = vh // 2, vw // 2, blk // 2
        else:
            y, st2 = fused_conv3x3(z, kw, pad_mode="zero", stats=True,
                                   interpret=interpret)

        if stage == "rows":
            st2 = fold_stats_correct(y, st2, b, vh)
            mask = None if i == len(_SCHEDULE) - 1 else seam_mask_rows(
                b, blk, vh)
        else:
            st2 = fold_stats_correct_grid(y, st2, gh, gw, vh, vw)
            mask = None if i == len(_SCHEDULE) - 1 else seam_mask_grid(
                gh, gw, blk, blk, vh, vw)

        bn = params[f"block{i}_bn"]
        ra = batch_stats[f"block{i}_bn"]
        n = b * vh * vw
        z, nm, nv = _bn_act_mask(y, st2, n, kb, bn["scale"], bn["bias"],
                                 ra["mean"], ra["var"], train, mask)
        new_stats[f"block{i}_bn"] = {"mean": nm, "var": nv}

    if stage == "rows":
        z = unfold_rows(z, b, vh)
    else:
        z = unfold_grid(z, gh, gw, vh, vw)

    # ---- dense head (discriminator.py:40-45; NHWC flatten as in the flax
    # module — io/checkpoint.py handles the .pth permutation) ----
    z = z.reshape(b, -1)
    d1 = params["dense1"]["Dense_0"]
    z = z @ d1["kernel"].astype(cdtype) + d1["bias"].astype(cdtype)
    z = leaky_relu(z, 0.2)
    d2 = params["dense2"]["Dense_0"]
    logits = z @ d2["kernel"].astype(cdtype) + d2["bias"].astype(cdtype)
    return logits.astype(jnp.float32), new_stats
