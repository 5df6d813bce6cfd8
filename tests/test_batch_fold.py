"""Zero-seam batch folding (ops/batch_fold.py): exactness vs the plain
batched conv — forward and both gradients, stride 1 and 2.

This pins the math the round-4 batched Pallas conv family builds on
(DESIGN.md "Round-4 ammunition"): folding batch into rows with seam zeros
must be EXACT for zero-pad convs, including through the VJP (seam output
rows carry garbage, and unfold must make their cotangents vanish)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusr.models.layers import conv_apply
from tpusr.ops.batch_fold import (fold_grid, fold_rows, fold_seam,
                                  folded_conv_apply, folded_conv_grid,
                                  unfold_grid, unfold_rows)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("stride,k,h,w,ci,co", [
    (1, 3, 12, 10, 4, 6),     # generic stride-1 k3
    (1, 3, 8, 8, 3, 5),       # D-stem-like thin Cin
    (2, 3, 12, 10, 4, 6),     # stride-2 (D's s2 blocks)
    (1, 5, 12, 10, 4, 6),     # odd k > 3 (seam = 2)
    (1, 9, 16, 16, 4, 3),     # SRGAN 9x9 head shape class
])
def test_folded_conv_matches_batched(stride, k, h, w, ci, co):
    b = 4
    x = _rand((b, h, w, ci))
    kern = _rand((k, k, ci, co), seed=1) * 0.1

    want = conv_apply(x, kern, stride, "zero")
    got = folded_conv_apply(x, kern, stride, "zero")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
def test_folded_conv_grads_match(stride):
    b, h, w, ci, co = 3, 8, 6, 4, 5
    x = _rand((b, h, w, ci))
    kern = _rand((3, 3, ci, co), seed=1) * 0.1
    cot = _rand((b, h // stride, w // stride if stride == 2 else w, co),
                seed=2)

    def loss_plain(x, kern):
        return jnp.sum(conv_apply(x, kern, stride, "zero") * cot)

    def loss_fold(x, kern):
        return jnp.sum(folded_conv_apply(x, kern, stride, "zero") * cot)

    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, kern)
    gx_f, gw_f = jax.grad(loss_fold, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_p),
                               rtol=1e-5, atol=1e-6)


def test_seam_rows_are_dropped_not_trusted():
    # the seam OUTPUT rows mix neighboring images; unfold must never
    # expose them. Construct two images whose folded conv seam row is
    # provably nonzero, and check the unfolded result equals per-image
    # convs anyway.
    k, s = 3, fold_seam(3, 1)
    x = jnp.stack([jnp.ones((4, 4, 2)), 2 * jnp.ones((4, 4, 2))])
    kern = jnp.ones((k, k, 2, 3))
    folded = fold_rows(x, s)
    y_full = conv_apply(folded, kern, 1, "zero")
    seam_row = y_full[0, 4]  # mixes image 0's last row and image 1's first
    assert float(jnp.max(jnp.abs(seam_row))) > 0
    got = unfold_rows(y_full, 2, 4, 1)
    want = conv_apply(x, kern, 1, "zero")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stride,seams", [
    (1, (None, None)),        # minimal seams
    (1, (8, 8)),              # alignment-raised seams (Pallas W%8 case)
    (2, (None, None)),
    (2, (4, 6)),              # raised, even (stride-grid aligned)
])
def test_folded_conv_grid_matches_batched(stride, seams):
    b, h, w, ci, co = 8, 12, 10, 4, 6
    x = _rand((b, h, w, ci))
    kern = _rand((3, 3, ci, co), seed=1) * 0.1

    want = conv_apply(x, kern, stride, "zero")
    got = folded_conv_grid(x, kern, stride, "zero", 2, 4,
                           seam_h=seams[0], seam_w=seams[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_folded_conv_grid_grads_match():
    b, h, w, ci, co = 4, 8, 6, 3, 5
    x = _rand((b, h, w, ci))
    kern = _rand((3, 3, ci, co), seed=1) * 0.1
    cot = _rand((b, h, w, co), seed=2)

    def loss_plain(x, kern):
        return jnp.sum(conv_apply(x, kern, 1, "zero") * cot)

    def loss_fold(x, kern):
        return jnp.sum(folded_conv_grid(x, kern, 1, "zero", 2, 2) * cot)

    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, kern)
    gx_f, gw_f = jax.grad(loss_fold, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_p),
                               rtol=1e-5, atol=1e-6)


def test_fold_grid_roundtrip_identity():
    x = _rand((6, 5, 7, 2))
    f = fold_grid(x, 2, 3, 3, 1)
    assert f.shape == (1, 2 * 8, 3 * 8, 2)
    back = unfold_grid(f, 2, 3, 5, 7)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_grid_fold_through_pallas_kernel_interpret():
    """The exact route tools/ab_fold_conv.py measures on hardware: batch-8
    small-spatial conv as ONE fused_conv3x3 over the 2-D grid canvas
    (interpret mode — the Mosaic path needs the real chip). Pins fwd and
    both grads vs the plain batched conv."""
    from tpusr.ops.pallas_conv import fused_conv3x3

    b, h, w, ci, co = 8, 24, 24, 128, 128
    gh, gw, sh, sw = 2, 4, 8, 8   # canvas (1, 64, 128, 128)
    x = _rand((b, h, w, ci)) * 0.2
    kern = _rand((3, 3, ci, co), seed=1) * 0.05
    cot = _rand((b, h, w, co), seed=2)

    def loss_plain(x, kern):
        return jnp.sum(conv_apply(x, kern, 1, "zero") * cot)

    def loss_grid(x, kern):
        y = fused_conv3x3(fold_grid(x, gh, gw, sh, sw), kern,
                          pad_mode="zero", interpret=True)
        return jnp.sum(unfold_grid(y, gh, gw, h, w) * cot)

    np.testing.assert_allclose(
        float(loss_grid(x, kern)), float(loss_plain(x, kern)), rtol=1e-5)
    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, kern)
    gx_f, gw_f = jax.grad(loss_grid, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_p),
                               rtol=1e-4, atol=1e-4)


def test_env_gated_fold_route_equivalence(monkeypatch):
    """TPUSR_FOLD_BATCH=rows must be a pure routing change: a small
    D-like conv stack (s1 + s2, batch 4) produces identical values."""
    b = 4
    x = _rand((b, 16, 12, 8)) * 0.3
    k1 = _rand((3, 3, 8, 16), seed=1) * 0.1
    k2 = _rand((3, 3, 16, 16), seed=2) * 0.1

    def stack(x):
        y = conv_apply(x, k1, 1, "zero")
        y = jnp.maximum(y, 0.2 * y)
        return conv_apply(y, k2, 2, "zero")

    monkeypatch.delenv("TPUSR_FOLD_BATCH", raising=False)
    want = stack(x)
    monkeypatch.setenv("TPUSR_FOLD_BATCH", "rows")
    got = stack(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_prologue_fill_makes_folded_fused_conv_exact():
    """Prologue-carrying folded conv (interpret): zero seams LEAK
    (act(eff_bias) != 0 in the halo); fill = -eff_bias/eff_scale restores
    exactness. This pins the round-4 rule for folding the D's BN+lrelu
    conv chain."""
    from tpusr.ops.pallas_conv import fused_conv3x3

    # h chosen so the folded canvas b*(h+seam)=64 is 8-row aligned
    b, h, w, ci, co = 4, 15, 16, 128, 128
    x = _rand((b, h, w, ci)) * 0.3
    kern = _rand((3, 3, ci, co), seed=1) * 0.05
    es = jnp.asarray(np.random.default_rng(3).uniform(0.5, 1.5, ci),
                     jnp.float32)
    eb = jnp.asarray(np.random.default_rng(4).normal(0, 0.5, ci),
                     jnp.float32)

    def act(v):
        return jnp.where(v > 0, v, 0.2 * v)

    want = conv_apply(act(x * es + eb), kern, 1, "zero")

    s = fold_seam(3, 1)
    y_zero = unfold_rows(fused_conv3x3(
        fold_rows(x, s), kern, es, eb, act="leaky_relu", pad_mode="zero",
        interpret=True), b, h, 1)
    assert float(jnp.max(jnp.abs(y_zero - want))) > 1e-3  # zero seams leak

    y_fill = unfold_rows(fused_conv3x3(
        fold_rows(x, s, fill=-eb / es), kern, es, eb, act="leaky_relu",
        pad_mode="zero", interpret=True), b, h, 1)
    np.testing.assert_allclose(np.asarray(y_fill), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fold_stats_correction():
    """Canvas stats epilogue minus seam-output-row sums == stats over the
    valid unfolded output (what the following BatchNorm consumes)."""
    from tpusr.ops.batch_fold import fold_stats_correct
    from tpusr.ops.pallas_conv import fused_conv3x3

    b, h, w, ci, co = 4, 15, 16, 128, 128
    x = _rand((b, h, w, ci)) * 0.3
    kern = _rand((3, 3, ci, co), seed=1) * 0.05

    y_canvas, stats = fused_conv3x3(fold_rows(x, 1), kern, pad_mode="zero",
                                    stats=True, interpret=True)
    fixed = fold_stats_correct(y_canvas, stats, b, h)

    y_valid = unfold_rows(y_canvas, b, h, 1).astype(jnp.float32)
    want = jnp.stack([jnp.sum(y_valid, axis=(0, 1, 2)),
                      jnp.sum(y_valid * y_valid, axis=(0, 1, 2))])
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fold_roundtrip_identity():
    x = _rand((5, 6, 7, 2))
    f = fold_rows(x, 2)
    assert f.shape == (1, 5 * 8, 7, 2)
    back = unfold_rows(f, 5, 6, 1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


# ---------------------------------------------------- stride-2 packed route
def test_space_to_depth_pack_identity():
    """Packed stride-1 conv over s2d(x) with pack_s2_weights == stride-2
    conv, via the pure-XLA oracle (full 3x3 kernel with zero taps)."""
    from tpusr.ops.batch_fold import pack_s2_weights, space_to_depth2
    from tpusr.ops.pallas_conv import _fused_ref

    x = _rand((1, 12, 10, 4))
    kern = _rand((3, 3, 4, 6), seed=1) * 0.1
    want = conv_apply(x, kern, 2, "zero")
    xp = space_to_depth2(x)
    v = pack_s2_weights(kern)
    got, _ = _fused_ref(xp, v, None, None, affine=False, act=None,
                        reflect=False, stats=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_conv3x3_s2_packed_pallas_interpret():
    """The 4-tap Pallas kernel (interpret) matches the stride-2 conv on a
    D-shaped layer (b0-like geometry, scaled down in C)."""
    from tpusr.ops.batch_fold import conv3x3_s2_packed

    x = _rand((1, 128, 128, 32))
    kern = _rand((3, 3, 32, 64), seed=1) * 0.1
    want = conv_apply(x, kern, 2, "zero")
    got = conv3x3_s2_packed(x, kern, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_folded_s2_pallas_matches_batched():
    from tpusr.ops.batch_fold import folded_conv_s2_pallas

    b = 4
    x = _rand((b, 32, 128, 32))
    kern = _rand((3, 3, 32, 32), seed=1) * 0.1
    want = conv_apply(x, kern, 2, "zero")
    got = folded_conv_s2_pallas(x, kern, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_folded_s2_grid_pallas_matches_batched():
    from tpusr.ops.batch_fold import folded_conv_s2_grid_pallas

    b = 8
    x = _rand((b, 24, 24, 32))
    kern = _rand((3, 3, 32, 64), seed=1) * 0.1
    want = conv_apply(x, kern, 2, "zero")
    got = folded_conv_s2_grid_pallas(x, kern, 2, 4, seam_h=8, seam_w=8,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_s2_packed_grads_match():
    """Both cotangents of the folded 4-tap Pallas route (through the tap-
    subset custom VJP AND the weight-packing/fold autodiff around it) match
    plain-conv autodiff."""
    from tpusr.ops.batch_fold import folded_conv_s2_pallas

    b = 2
    x = _rand((b, 16, 64, 32))
    kern = _rand((3, 3, 32, 32), seed=1) * 0.1
    cot = _rand((b, 8, 32, 32), seed=2)

    def loss(f):
        return lambda x, k: jnp.sum(f(x, k) * cot)

    g_want = jax.grad(loss(lambda x, k: conv_apply(x, k, 2, "zero")),
                      argnums=(0, 1))(x, kern)
    g_got = jax.grad(loss(lambda x, k: folded_conv_s2_pallas(
        x, k, interpret=True)), argnums=(0, 1))(x, kern)
    for a, b_ in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_tap_subset_matches_full_kernel():
    """A full-9-tap call and a 4-tap call on a kernel whose other taps are
    zero agree (fwd + grads) — pins the subset indexing in fwd/wgrad/dgrad."""
    from tpusr.ops.batch_fold import S2_TAPS
    from tpusr.ops.pallas_conv import fused_conv3x3

    x = _rand((1, 16, 64, 128))
    kern = _rand((3, 3, 128, 128), seed=1) * 0.1
    mask = np.zeros((3, 3, 1, 1), np.float32)
    for t in S2_TAPS:
        mask[t // 3, t % 3] = 1.0
    kz = kern * jnp.asarray(mask)
    cot = _rand((1, 16, 64, 128), seed=2)

    def loss(taps):
        return lambda x, k: jnp.sum(fused_conv3x3(
            x, k, pad_mode="zero", interpret=True, taps=taps) * cot)

    y_full = fused_conv3x3(x, kz, pad_mode="zero", interpret=True)
    y_sub = fused_conv3x3(x, kz, pad_mode="zero", interpret=True,
                          taps=S2_TAPS)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)
    g_full = jax.grad(loss(None), argnums=(0, 1))(x, kz)
    g_sub = jax.grad(loss(S2_TAPS), argnums=(0, 1))(x, kz)
    np.testing.assert_allclose(np.asarray(g_sub[0]), np.asarray(g_full[0]),
                               rtol=1e-5, atol=1e-5)
    # dw at the live taps must agree; the subset path returns exact zeros at
    # the dead taps (full-kernel autodiff computes real cotangents there,
    # which the packing VJP would discard anyway)
    for t in S2_TAPS:
        np.testing.assert_allclose(np.asarray(g_sub[1][t // 3, t % 3]),
                                   np.asarray(g_full[1][t // 3, t % 3]),
                                   rtol=1e-5, atol=1e-5)


# --------------------------------------- in-kernel seam masking (v2 chain)
def _bn_affine(y, s, ss, n, cb):
    m_raw = s / n
    var = jnp.maximum(ss / n - jnp.square(m_raw), 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    return inv, -(m_raw) * inv  # scale=1, bias=0 BN for test simplicity


@pytest.mark.parametrize("cin", [4, 64])
def test_seam_masked_prologue_chain_rows(cin):
    """Two chained folded convs: conv1 emits seam-exact stats in-kernel;
    conv2 carries BN-affine + LeakyReLU as its prologue with in-kernel seam
    masking (NO elementwise pass between them). Must equal the plain
    batched pipeline, fwd + grads. cin=64 also exercises the small-C
    affine-prologue path (identity-padded lanes)."""
    from tpusr.ops.batch_fold import fold_rows, unfold_rows
    from tpusr.ops.pallas_conv import fused_conv3x3

    b, h, w_, co = 4, 16, 64, 64
    x = _rand((b, h, w_, cin))
    k1 = _rand((3, 3, cin, co), seed=1) * 0.1
    cb1 = _rand((co,), seed=2) * 0.1  # conv1 bias (pending through BN)
    k2 = _rand((3, 3, co, co), seed=3) * 0.1
    cot = _rand((b, h, w_, co), seed=4)
    n = b * h * w_

    def plain(x, k1, k2):
        y1 = conv_apply(x, k1, 1, "zero") + cb1
        s = jnp.sum(y1, (0, 1, 2))
        ss = jnp.sum(y1 * y1, (0, 1, 2))
        es, eb = _bn_affine(y1, s, ss, n, cb1)
        a = y1 * es + eb
        a = jnp.where(a >= 0, a, 0.2 * a)
        return conv_apply(a, k2, 1, "zero")

    def folded(x, k1, k2):
        xf = fold_rows(x, 2)
        blk = h + 2
        y1, st = fused_conv3x3(xf, k1, pad_mode="zero", stats=True,
                               interpret=True, seam=(blk, h, w_, w_))
        # pending-bias BN: stats are of the bias-free y1
        s, ss = st[0] + n * cb1, None
        ssf = st[1] + 2 * cb1 * st[0] + n * cb1 * cb1
        es, eb = _bn_affine(None, s, ssf, n, cb1)
        eb = eb + cb1 * es  # fold the pending conv bias into the affine
        y2 = fused_conv3x3(y1, k2, es, eb, act="leaky_relu",
                           pad_mode="zero", interpret=True,
                           seam=(blk, h, w_, w_))
        return unfold_rows(y2, b, h)

    yw = plain(x, k1, k2)
    yf = folded(x, k1, k2)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yw),
                               rtol=2e-4, atol=2e-4)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) * cot)

    gw = jax.grad(loss(plain), argnums=(0, 1, 2))(x, k1, k2)
    gf = jax.grad(loss(folded), argnums=(0, 1, 2))(x, k1, k2)
    for a, b_ in zip(gf, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_seam_masked_grid_s2_packed():
    """Grid-fold + s2-packed conv with in-kernel seam masking and seam-
    exact stats (the folded-D v2 building block): fwd + stats + grads vs
    the plain batched stride-2 conv."""
    from tpusr.ops.batch_fold import (S2_TAPS, fold_grid, pack_s2_weights,
                                      space_to_depth2, unfold_grid)
    from tpusr.ops.pallas_conv import fused_conv3x3

    b, h, ci, co = 8, 24, 32, 48
    x = _rand((b, h, h, ci))
    kern = _rand((3, 3, ci, co), seed=1) * 0.1
    cot = _rand((b, h // 2, h // 2, co), seed=2)

    def plain(x, k):
        y = conv_apply(x, k, 2, "zero")
        s = jnp.sum(y, (0, 1, 2))
        ss = jnp.sum(y * y, (0, 1, 2))
        return jnp.sum(y * cot) + 0.01 * jnp.sum(s) + 0.001 * jnp.sum(ss)

    def folded(x, k):
        xg = fold_grid(x, 2, 4, 8, 8)           # cells 32, valid 24
        xp = space_to_depth2(xg)                # packed cells 16, valid 12
        y, st = fused_conv3x3(xp, pack_s2_weights(k), pad_mode="zero",
                              stats=True, taps=S2_TAPS, interpret=True,
                              seam=(16, 12, 16, 12))
        yv = unfold_grid(y, 2, 4, h // 2, h // 2)
        return (jnp.sum(yv * cot) + 0.01 * jnp.sum(st[0])
                + 0.001 * jnp.sum(st[1]))

    np.testing.assert_allclose(float(folded(x, kern)), float(plain(x, kern)),
                               rtol=1e-5)
    gw = jax.grad(plain, argnums=(0, 1))(x, kern)
    gf = jax.grad(folded, argnums=(0, 1))(x, kern)
    for a, b_ in zip(gf, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_fold_geometry_property_sweep():
    """Randomized sweep over the supported fold-geometry class: row folds
    (stride 1/2, random seams), grid folds (random grids/seams), and the
    packed stride-2 route must all equal the plain batched conv. Catches
    edge geometries (odd valid sizes, minimal seams, non-square cells) the
    fixed-shape golden tests don't cover."""
    from tpusr.ops.batch_fold import (fold_seam, folded_conv_s2_pallas,
                                      folded_conv_s2_grid_pallas)

    rng = np.random.default_rng(42)
    for trial in range(12):
        stride = int(rng.choice([1, 2]))
        b = int(rng.choice([2, 3, 4, 6, 8]))
        h = int(rng.choice([4, 6, 8, 10, 12, 16])) * (2 if stride == 2
                                                      else 1)
        w_ = int(rng.choice([4, 6, 8, 10, 12]))
        ci, co = int(rng.choice([2, 3, 5])), int(rng.choice([2, 4, 7]))
        x = jnp.asarray(rng.normal(size=(b, h, w_, ci)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.2, jnp.float32)
        want = conv_apply(x, k, stride, "zero")

        # rows fold with a random (valid) seam
        s_min = fold_seam(3, stride)
        s = s_min + int(rng.integers(0, 3)) * (2 if stride == 2 else 1)
        y = conv_apply(fold_rows(x, s), k, stride, "zero")
        got = unfold_rows(y, b, h // stride, stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"rows t{trial} s={s}")

        # grid fold (random factorization of b) where stride phase allows
        facs = [(g, b // g) for g in range(1, b + 1) if b % g == 0]
        gh, gw = facs[int(rng.integers(0, len(facs)))]
        step = 2 if stride == 2 else 1
        sh = s_min + int(rng.integers(0, 3)) * step
        sw = s_min + int(rng.integers(0, 3)) * step
        if (h + sh) % stride == 0 and (w_ + sw) % stride == 0:
            got = folded_conv_grid(x, k, stride, "zero", gh, gw, sh, sw)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
                err_msg=f"grid t{trial} {gh}x{gw} s=({sh},{sw})")

        # packed stride-2 Pallas route (interpret)
        if stride == 2 and w_ % 2 == 0:
            got = folded_conv_s2_pallas(x, k, seam=max(2, s_min),
                                        interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=f"s2pack t{trial}")


def test_seam_spec_property_sweep():
    """Randomized seam-spec sweep through the interpret kernel: for random
    cell geometries, a seam-masked fused conv with affine+act prologue and
    stats must equal prologue -> explicit mask -> conv -> masked stats in
    XLA, fwd and grads. Pins the in-kernel iota row/col mask indexing for
    arbitrary (block, valid) combinations and grid positions."""
    from tpusr.ops.pallas_conv import _seam_mask_hw, fused_conv3x3

    rng = np.random.default_rng(7)
    for trial in range(8):
        bh = int(rng.choice([4, 5, 8, 10, 13]))
        vh = int(rng.integers(2, bh))
        bw = int(rng.choice([4, 6, 8, 9]))
        vw = int(rng.integers(2, bw + 1))
        nh = int(rng.choice([2, 3, 4]))
        nw = int(rng.choice([1, 2, 3]))
        H, W, C = bh * nh, bw * nw, 8
        if H % 8:
            H, nh = bh * -(-8 // bh) * 8 // bh, None  # keep H small-ish
            H = bh * max(1, (8 // bh) or 1)
            while H % 8:
                H += bh
        x = jnp.asarray(rng.normal(size=(1, H, W, C)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, C, 16)) * 0.2, jnp.float32)
        es = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        eb = jnp.asarray(rng.normal(size=(C,)) * 0.3, jnp.float32)
        spec = (bh, vh, bw, vw)
        cot = jnp.asarray(rng.normal(size=(1, H, W, 16)), jnp.float32)

        def fold_loss(x, k, es, eb):
            y, st = fused_conv3x3(x, k, es, eb, act="leaky_relu",
                                  pad_mode="zero", stats=True,
                                  interpret=True, seam=spec)
            return jnp.sum(y * cot) + 0.01 * jnp.sum(st)

        def ref_loss(x, k, es, eb):
            a = x * es + eb
            a = jnp.where(a >= 0, a, 0.2 * a)
            a = a * _seam_mask_hw(H, W, spec, a.dtype)
            y = conv_apply(a, k, 1, "zero")
            m = _seam_mask_hw(H, W, spec, jnp.float32)
            ym = y * m
            st = jnp.stack([jnp.sum(ym, (0, 1, 2)),
                            jnp.sum(ym * y, (0, 1, 2))])
            return jnp.sum(y * cot) + 0.01 * jnp.sum(st)

        y_f, st_f = fused_conv3x3(x, k, es, eb, act="leaky_relu",
                                  pad_mode="zero", stats=True,
                                  interpret=True, seam=spec)
        a = jnp.where(x * es + eb >= 0, x * es + eb, 0.2 * (x * es + eb))
        a = a * _seam_mask_hw(H, W, spec, a.dtype)
        y_r = conv_apply(a, k, 1, "zero")
        m = _seam_mask_hw(H, W, spec, jnp.float32)
        st_r = jnp.stack([jnp.sum(y_r * m, (0, 1, 2)),
                          jnp.sum(y_r * m * y_r, (0, 1, 2))])
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"fwd t{trial} {spec}")
        np.testing.assert_allclose(np.asarray(st_f), np.asarray(st_r),
                                   rtol=1e-4, atol=1e-3,
                                   err_msg=f"stats t{trial} {spec}")
        gf = jax.grad(fold_loss, argnums=(0, 1, 2, 3))(x, k, es, eb)
        gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(x, k, es, eb)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4,
                err_msg=f"grad t{trial} spec={spec} H={H} W={W}")
