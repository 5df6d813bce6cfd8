"""Folded discriminator dataflow (models/srgan_folded.py) vs the flax
Discriminator — logits, BN running stats, and gradients must match exactly
(same math, different execution geometry). Pallas runs interpret-mode here;
the compiled path is exercised on hardware by tools/ab_fold_conv.py and the
TPUSR_D_FOLD full-step A/B."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusr.models.srgan import Discriminator
from tpusr.models.srgan_folded import (discriminator_apply_folded,
                                       folded_d_supported)

B, HR = 4, 64


@pytest.fixture(scope="module")
def d_setup():
    d = Discriminator()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, HR, HR, 3)), jnp.float32)
    v = d.init(jax.random.PRNGKey(1), jnp.zeros((1, HR, HR, 3)))
    return d, v["params"], v["batch_stats"], x


def _flax_apply(d, p, st, x, train=True):
    out, upd = d.apply({"params": p, "batch_stats": st}, x, train,
                       mutable=["batch_stats"])
    return out, upd["batch_stats"]


def test_supported_gate():
    assert folded_d_supported((8, 192, 192, 3))
    assert folded_d_supported((4, 64, 64, 3))
    assert not folded_d_supported((8, 100, 100, 3))   # not 16-divisible
    assert not folded_d_supported((3, 64, 64, 3))     # odd batch
    assert not folded_d_supported((8, 192, 96, 3))    # non-square


@pytest.mark.parametrize("train", [True, False])
def test_folded_matches_flax(d_setup, train):
    d, p, st, x = d_setup
    want, want_st = _flax_apply(d, p, st, x, train)
    got, got_st = discriminator_apply_folded(p, st, x, train=train,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    for k in want_st:
        for f in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(got_st[k][f]),
                                       np.asarray(want_st[k][f]),
                                       rtol=1e-4, atol=1e-5, err_msg=(k, f))


def test_folded_grads_match_flax(d_setup):
    """Param and input cotangents through a D-loss-like scalar agree — the
    folded dataflow's seam masking/stat corrections must be gradient-exact,
    not just forward-exact."""
    d, p, st, x = d_setup
    cot = jnp.asarray(np.random.default_rng(2).normal(size=(B, 1)),
                      jnp.float32)

    def loss_flax(p_, x_):
        out, _ = _flax_apply(d, p_, st, x_, True)
        return jnp.sum(out * cot)

    def loss_fold(p_, x_):
        out, _ = discriminator_apply_folded(p_, st, x_, train=True,
                                            interpret=True)
        return jnp.sum(out * cot)

    gw, gx = jax.grad(loss_flax, argnums=(0, 1))(p, x)
    fw, fx = jax.grad(loss_fold, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(gx),
                               rtol=2e-3, atol=1e-3)
    flat_g = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fw))
    for path, leaf in flat_g:
        got = flat_f[path]
        # Tolerances sit at the D's measured gradient-chaos floor: both
        # paths sum BN stats in f32 (different orders, ~1e-7 forward rel
        # diff) and a random-init D's grads move 1e-3..2e-2 under 1e-8
        # forward perturbations (BN-chain amplification — measured against
        # flax itself). Conv-bias grads are mathematically ZERO (BN shift
        # invariance): the folded path cancels exactly, flax leaves ~1e-6
        # noise — hence the atol floor. VJP exactness of the folded convs
        # is pinned to 1e-13 in tests/test_batch_fold.py.
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=2e-2, atol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_folded_bf16(d_setup):
    """bf16 activations: folded and flax paths agree within bf16 noise."""
    d16 = Discriminator(dtype="bfloat16")
    _, p, st, x = d_setup
    want, _ = _flax_apply(d16, p, st, x, True)
    got, _ = discriminator_apply_folded(p, st, x, train=True,
                                        dtype="bfloat16", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.35)


# ------------------------------------------------------- folded generator
GB, GP, GFACTOR, GBLOCKS = 4, 32, 2, 2


@pytest.fixture(scope="module")
def g_setup():
    from tpusr.models.srgan import Generator

    g = Generator(factor=GFACTOR, residual_blocks_count=GBLOCKS)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (GB, GP, GP, 3)), jnp.float32)
    v = g.init(jax.random.PRNGKey(4), jnp.zeros((1, GP, GP, 3)))
    return g, v["params"], v["batch_stats"], x


def test_folded_g_supported_gate():
    from tpusr.models.srgan_folded import folded_g_supported

    assert folded_g_supported((8, 24, 24, 3), 8)    # reference workload
    assert folded_g_supported((4, 32, 32, 3), 2)
    assert not folded_g_supported((4, 8, 8, 3), 8)  # first canvas too thin
    assert not folded_g_supported((8, 26, 26, 3), 8)  # p % 4 != 0
    assert not folded_g_supported((3, 24, 24, 3), 8)  # odd batch


@pytest.mark.parametrize("train", [True, False])
def test_folded_g_matches_flax(g_setup, train):
    from tpusr.models.srgan_folded import generator_apply_folded

    g, p, st, x = g_setup
    want, upd = g.apply({"params": p, "batch_stats": st}, x, train,
                        mutable=["batch_stats"])
    got, got_st = generator_apply_folded(p, st, x, GFACTOR, GBLOCKS,
                                         train=train, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    want_st = upd["batch_stats"]
    flat_w = jax.tree_util.tree_leaves_with_path(want_st)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got_st))
    for path, leaf in flat_w:
        np.testing.assert_allclose(np.asarray(flat_g[path]),
                                   np.asarray(leaf), rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_folded_g_grads_match_flax(g_setup):
    from tpusr.models.srgan_folded import generator_apply_folded

    g, p, st, x = g_setup
    cot = jnp.asarray(
        np.random.default_rng(6).normal(size=(GB, GP * GFACTOR,
                                              GP * GFACTOR, 3)), jnp.float32)

    def loss_flax(p_, x_):
        out, _ = g.apply({"params": p_, "batch_stats": st}, x_, True,
                         mutable=["batch_stats"])
        return jnp.sum(out * cot)

    def loss_fold(p_, x_):
        out, _ = generator_apply_folded(p_, st, x_, GFACTOR, GBLOCKS,
                                        train=True, interpret=True)
        return jnp.sum(out * cot)

    gw, gx = jax.grad(loss_flax, argnums=(0, 1))(p, x)
    fw, fx = jax.grad(loss_fold, argnums=(0, 1))(p, x)
    # chaos-floor tolerances: see the discriminator grad test note. The
    # per-element input grad additionally accumulates raw PReLU kink flips
    # (the two forwards differ by ~1e-7 f32-stat noise; pre-activations
    # within that of zero take different branches, and each flip spreads
    # through the conv transposes into many input positions) — so assert
    # in aggregate: relative L2 error small, no structural divergence.
    # Element-exact VJP checks live in tests/test_batch_fold.py.
    fxa, gxa = np.asarray(fx, np.float64), np.asarray(gx, np.float64)
    rel_l2 = np.linalg.norm(fxa - gxa) / np.linalg.norm(gxa)
    assert rel_l2 < 0.02, rel_l2
    flat_g = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fw))
    gscale = np.sqrt(sum(float(np.sum(np.square(np.asarray(l, np.float64))))
                         for _, l in flat_g))
    for path, leaf in flat_g:
        a = np.asarray(flat_f[path], np.float64)
        b_ = np.asarray(leaf, np.float64)
        nb = np.linalg.norm(b_)
        if not np.any(a):
            # the folded path cancels BN-shadowed conv-bias grads EXACTLY
            # (they are mathematically zero); flax computes them as
            # reduction noise that scales with the loss — require flax's
            # value to be noise-sized relative to the whole gradient
            assert nb < 1e-4 * gscale, (jax.tree_util.keystr(path), nb)
            continue
        rel = np.linalg.norm(a - b_) / nb
        assert rel < 0.02, (jax.tree_util.keystr(path), rel)


@pytest.mark.parametrize("train", [True, False])
def test_folded_v2_matches_flax(d_setup, train):
    from tpusr.models.srgan_folded import discriminator_apply_folded_v2

    d, p, st, x = d_setup
    want, want_st = _flax_apply(d, p, st, x, train)
    got, got_st = discriminator_apply_folded_v2(p, st, x, train=train,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    for k in want_st:
        for f in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(got_st[k][f]),
                                       np.asarray(want_st[k][f]),
                                       rtol=1e-4, atol=1e-5, err_msg=(k, f))


def test_folded_v2_grads_match_v1(d_setup):
    """v1 and v2 are the same math executed with different fusion
    boundaries — their grads must agree tightly (both folded, same float
    paths up to in-kernel masking order)."""
    from tpusr.models.srgan_folded import (discriminator_apply_folded,
                                           discriminator_apply_folded_v2)

    _, p, st, x = d_setup
    cot = jnp.asarray(np.random.default_rng(9).normal(size=(B, 1)),
                      jnp.float32)

    def loss(fn):
        def inner(p_, x_):
            out, _ = fn(p_, st, x_, True, None, True)
            return jnp.sum(out * cot)
        return inner

    g1 = jax.grad(loss(discriminator_apply_folded), argnums=(0, 1))(p, x)
    g2 = jax.grad(loss(discriminator_apply_folded_v2), argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               rtol=5e-3, atol=5e-4)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1[0]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g2[0]):
        a = np.asarray(leaf, np.float64)
        b_ = np.asarray(flat1[path], np.float64)
        nb = np.linalg.norm(b_)
        if nb < 1e-8:
            assert np.linalg.norm(a) < 1e-6, jax.tree_util.keystr(path)
            continue
        rel = np.linalg.norm(a - b_) / nb
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel)


def test_fused_g_eval_matches_flax(g_setup):
    """The prologue-chained fused eval forward (TPUSR_G_FUSE=2) equals the
    flax eval forward on a full image."""
    from tpusr.models.srgan_folded import (fused_g_eval_supported,
                                           generator_apply_fused_eval)

    g, p, st, _ = g_setup
    x = jnp.asarray(np.random.default_rng(11).uniform(0, 1, (1, 64, 96, 3)),
                    jnp.float32)
    assert fused_g_eval_supported(x.shape, GFACTOR)
    want = g.apply({"params": p, "batch_stats": st}, x, False)
    got = generator_apply_fused_eval(p, st, x, GFACTOR, GBLOCKS,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_g_eval_supported_gate():
    from tpusr.models.srgan_folded import fused_g_eval_supported

    assert fused_g_eval_supported((1, 96, 96, 3), 8)
    assert not fused_g_eval_supported((2, 96, 96, 3), 8)   # batch
    assert not fused_g_eval_supported((1, 90, 96, 3), 8)   # H % 8
    assert not fused_g_eval_supported((1, 96, 512, 3), 8)  # 4W > 1024
    assert fused_g_eval_supported((1, 96, 512, 3), 2)


@pytest.mark.parametrize("train", [True, False])
def test_folded_g_chain_matches_flax(g_setup, train):
    """chain=True (TPUSR_G_FOLD=2): intra-block prologue chaining +
    seam-exact in-kernel stats — same math, fwd + running stats."""
    from tpusr.models.srgan_folded import generator_apply_folded

    g, p, st, x = g_setup
    want, upd = g.apply({"params": p, "batch_stats": st}, x, train,
                        mutable=["batch_stats"])
    got, got_st = generator_apply_folded(p, st, x, GFACTOR, GBLOCKS,
                                         train=train, interpret=True,
                                         chain=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    want_st = upd["batch_stats"]
    flat_w = jax.tree_util.tree_leaves_with_path(want_st)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got_st))
    for path, leaf in flat_w:
        np.testing.assert_allclose(np.asarray(flat_g[path]),
                                   np.asarray(leaf), rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_folded_g_chain_grads_match_unchained(g_setup):
    """chain and no-chain are the same math with different fusion
    boundaries: grads agree tightly leaf-by-leaf (both folded)."""
    from tpusr.models.srgan_folded import generator_apply_folded

    _, p, st, x = g_setup
    cot = jnp.asarray(
        np.random.default_rng(8).normal(size=(GB, GP * GFACTOR,
                                              GP * GFACTOR, 3)), jnp.float32)

    def loss(chain):
        def inner(p_, x_):
            out, _ = generator_apply_folded(p_, st, x_, GFACTOR, GBLOCKS,
                                            train=True, interpret=True,
                                            chain=chain)
            return jnp.sum(out * cot)
        return inner

    g0 = jax.grad(loss(False), argnums=(0, 1))(p, x)
    g1 = jax.grad(loss(True), argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               rtol=1e-3, atol=1e-4)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(g0[0]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g1[0]):
        a = np.asarray(leaf, np.float64)
        b_ = np.asarray(flat0[path], np.float64)
        nb = np.linalg.norm(b_)
        if nb < 1e-8:
            assert np.linalg.norm(a) < 1e-6, jax.tree_util.keystr(path)
            continue
        rel = np.linalg.norm(a - b_) / nb
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel)
