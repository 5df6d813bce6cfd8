"""Golden tests for the line-buffer dense-block mega-kernel (interpret mode).

The compiled path only lowers on real TPU hardware; these tests pin the
kernel's math — including the ring/warmup/edge-mask machinery — against the
XLA reference on the CPU interpreter. Hardware validation is recorded in
DESIGN.md (bf16 max_err 3.1e-2 at activation scale ~6.6 on the 270x480
bench shape = bf16 reassociation noise).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusr.ops.pallas_dense import (
    _col_plan,
    dense_block_line,
    dense_block_reference,
    dense_line_supported,
)

NF, GC = 64, 32


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    kshapes = [NF + i * GC for i in range(5)]
    ks = tuple(
        jnp.asarray(rng.normal(0, 0.05, (3, 3, c, GC if i < 4 else NF)),
                    jnp.float32) for i, c in enumerate(kshapes))
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.02, (GC if i < 4 else NF,)), jnp.float32)
        for i in range(5))
    return ks, bs


@pytest.mark.parametrize("H,W", [(32, 64), (30, 64), (27, 80), (16, 128)])
def test_line_matches_reference(params, H, W):
    ks, bs = params
    rng = np.random.default_rng(H * 100 + W)
    HB = max(-(-H // 8) * 8, 16)
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, NF)), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, HB - H), (0, 0), (0, 128 - NF)))
    assert dense_line_supported(xp.shape, H)
    yp = dense_block_line(xp, ks, bs, H, interpret=True)
    ref = dense_block_reference(x, ks, bs)
    np.testing.assert_allclose(np.asarray(yp[:, :H, :, :NF]),
                               np.asarray(ref), atol=2e-5)
    # padding contract: rows [H, HB) and lanes [NF:) stay exactly zero so
    # 69 chained blocks never need re-padding
    if H < HB:
        assert float(jnp.max(jnp.abs(yp[:, H:]))) == 0.0
    assert float(jnp.max(jnp.abs(yp[:, :, :, NF:]))) == 0.0


def test_column_split(params, monkeypatch):
    monkeypatch.setenv("TPUSR_DENSE_VMEM_MB", "1")
    import tpusr.ops.pallas_dense as pd

    monkeypatch.setattr(pd, "_VMEM_BUDGET", 2**20)
    ks, bs = params
    rng = np.random.default_rng(7)
    H, W = 26, 240
    plan = _col_plan(W, 4)
    assert len(plan) > 1  # actually exercises the seam logic
    covered = sorted((il + kl, il + kh) for il, ir, kl, kh in plan)
    assert covered[0][0] == 0 and covered[-1][1] == W
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, NF)), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 32 - H), (0, 0), (0, 128 - NF)))
    yp = dense_block_line(xp, ks, bs, H, interpret=True)
    ref = dense_block_reference(x, ks, bs)
    np.testing.assert_allclose(np.asarray(yp[:, :H, :, :NF]),
                               np.asarray(ref), atol=2e-5)


def test_custom_vjp_matches_reference_grads(params):
    ks, bs = params
    rng = np.random.default_rng(3)
    H, W = 24, 64
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, NF)), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - NF)))

    def loss_line(xp_, ks_, bs_):
        return jnp.sum(dense_block_line(xp_, ks_, bs_, H, interpret=True) ** 2)

    def loss_ref(xp_, ks_, bs_):
        y = dense_block_reference(xp_[..., :NF], ks_, bs_)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_line, argnums=(0, 1, 2))(xp, ks, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, ks, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_rrdbnet_line_routing(params):
    from tpusr.models.rrdb import RRDBNet

    rng = np.random.default_rng(5)
    lr = jnp.asarray(rng.random((1, 22, 40, 3)), jnp.float32)
    v = RRDBNet(scale=4, nb=2).init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    y1 = RRDBNet(scale=4, nb=2, fusion="interpret").apply(v, lr)
    y2 = RRDBNet(scale=4, nb=2, fusion="off").apply(v, lr)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_wide_column_conv(params):
    """W > 1024 single-conv route: _fwd_pallas_cols overlap-discard."""
    from tpusr.ops.pallas_conv import _fused_ref, fused_conv3x3

    rng = np.random.default_rng(11)
    for W, pad in [(1152, "zero"), (1920, "reflection")]:
        x = jnp.asarray(rng.normal(0, 1, (1, 64, W, 128)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 128, 64)), jnp.float32)
        y = fused_conv3x3(x, w, pad_mode=pad, interpret=True)
        ref, _ = _fused_ref(x, w, None, None, affine=False, act=None,
                            reflect=(pad == "reflection"), stats=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
