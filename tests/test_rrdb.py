"""RRDB/ESRGAN generator tests (BASELINE config 5 model family)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.rrdb import RRDBNet


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_canonical_param_count():
    """ESRGAN RRDBNet(3->3, nf64, nb23, gc32, x4) = 16,697,987 params."""
    net = RRDBNet()
    v = net.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    assert n_params(v["params"]) == 16_697_987


def test_forward_shape_x4():
    net = RRDBNet(nf=16, nb=2, gc=8, scale=4)
    x = jax.random.uniform(jax.random.key(1), (1, 12, 16, 3))
    v = net.init(jax.random.key(0), x)
    y = net.apply(v, x)
    assert y.shape == (1, 48, 64, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_forward_shape_x2():
    net = RRDBNet(nf=16, nb=1, gc=8, scale=2)
    x = jnp.zeros((2, 8, 8, 3))
    v = net.init(jax.random.key(0), x)
    assert net.apply(v, x).shape == (2, 16, 16, 3)


def test_packed_dense_block_matches_naive():
    """The MXU-packed dense-block evaluation == the canonical concat form
    with the SAME parameters (producer-side kernel regrouping is pure
    fp-reassociation)."""
    from tpusr.models.rrdb import DenseBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 12, 10, 16)), jnp.float32)
    packed = DenseBlock(nf=16, gc=8, packed=True)
    naive = DenseBlock(nf=16, gc=8, packed=False)
    v = packed.init(jax.random.key(0), x)
    got = packed.apply(v, x)
    want = naive.apply(v, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_net_matches_naive():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((1, 12, 16, 3)), jnp.float32)
    net_p = RRDBNet(nf=16, nb=2, gc=8, scale=2, packed=True)
    net_n = RRDBNet(nf=16, nb=2, gc=8, scale=2, packed=False)
    v = net_p.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(net_p.apply(v, x)),
                               np.asarray(net_n.apply(v, x)),
                               rtol=1e-5, atol=1e-5)

