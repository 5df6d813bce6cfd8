"""Fused Pallas conv3x3 (ops/pallas_conv.py) — correctness via the CPU
interpreter (interpret=True; the Mosaic path needs the real chip and is
exercised by the DIP bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.ops.pallas_conv import _fused_ref, fused_conv3x3, fused_conv_supported


@pytest.mark.parametrize("pad", ["reflection", "zero"])
@pytest.mark.parametrize("act,affine", [(None, False), ("leaky_relu", True)])
def test_fused_conv_matches_reference(pad, act, affine):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (128,)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)

    y, st = fused_conv3x3(x, w, es if affine else None,
                          eb if affine else None, act=act, pad_mode=pad,
                          stats=True, interpret=True)
    yr, str_ = _fused_ref(x, w, es, eb, affine=affine, act=act,
                          reflect=(pad == "reflection"), stats=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(str_),
                               rtol=1e-5, atol=1e-2)


def test_fused_conv_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (128,)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)

    def loss(f):
        def inner(x, w, es, eb):
            y, st = f(x, w, es, eb)
            return (0.5 * jnp.sum(jnp.square(y)) + 0.1 * jnp.sum(st[0])
                    + 0.01 * jnp.sum(st[1]))
        return inner

    g1 = jax.grad(loss(lambda x, w, es, eb: fused_conv3x3(
        x, w, es, eb, act="leaky_relu", pad_mode="reflection", stats=True,
        interpret=True)), argnums=(0, 1, 2, 3))(x, w, es, eb)
    g2 = jax.grad(loss(lambda x, w, es, eb: _fused_ref(
        x, w, es, eb, affine=True, act="leaky_relu", reflect=True,
        stats=True)), argnums=(0, 1, 2, 3))(x, w, es, eb)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4


def test_fused_conv_base_input_stats_and_grads():
    """base-input variant (SplitConv merge): y = conv(pro(x)) + base with the
    stats epilogue reducing the FINAL sum; all five cotangents must match
    autodiff of the XLA reference."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (128,)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    base = jnp.asarray(rng.standard_normal((1, 64, 128, 128)), jnp.float32)

    y, st = fused_conv3x3(x, w, es, eb, act="leaky_relu",
                          pad_mode="reflection", stats=True, base=base,
                          interpret=True)
    yr, str_ = _fused_ref(x, w, es, eb, affine=True, act="leaky_relu",
                          reflect=True, stats=True, base=base)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(str_),
                               rtol=1e-5, atol=1e-2)

    def loss(f):
        def inner(x, w, es, eb, base):
            y, st = f(x, w, es, eb, base)
            return (0.5 * jnp.sum(jnp.square(y)) + 0.1 * jnp.sum(st[0])
                    + 0.01 * jnp.sum(st[1]))
        return inner

    g1 = jax.grad(loss(lambda x, w, es, eb, b: fused_conv3x3(
        x, w, es, eb, act="leaky_relu", pad_mode="reflection", stats=True,
        base=b, interpret=True)), argnums=(0, 1, 2, 3, 4))(x, w, es, eb, base)
    g2 = jax.grad(loss(lambda x, w, es, eb, b: _fused_ref(
        x, w, es, eb, affine=True, act="leaky_relu", reflect=True,
        stats=True, base=b)), argnums=(0, 1, 2, 3, 4))(x, w, es, eb, base)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4


def test_supported_shapes():
    assert fused_conv_supported((1, 512, 512, 128), 3, 1)
    assert not fused_conv_supported((2, 512, 512, 128), 3, 1)  # batch
    assert not fused_conv_supported((1, 512, 512, 132), 3, 1)  # lanes
    assert not fused_conv_supported((1, 512, 512, 128), 3, 2)  # stride
    assert not fused_conv_supported((1, 512, 512, 128), 1, 1)  # k
    assert not fused_conv_supported((1, 30, 512, 128), 3, 1)   # tiny H


@pytest.mark.parametrize("cin,cout", [(32, 96), (64, 192), (32, 64)])
def test_small_c_tap_grouping(cin, cout):
    """Cin<128 packs 128//Cin taps per MXU pass — math identical."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
    y = fused_conv3x3(x, w, pad_mode="zero", interpret=True)
    ref, _ = _fused_ref(x, w, None, None, affine=False, act=None,
                        reflect=False, stats=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hpad_rows():
    """H not divisible by 8: zero row-padding reproduces zero-SAME exactly."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 66, 64, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.05, jnp.float32)
    assert fused_conv_supported(x.shape, 3, 1, allow_hpad=True, small_c=True)
    assert not fused_conv_supported(x.shape, 3, 1, small_c=True)
    y = fused_conv3x3(x, w, pad_mode="zero", interpret=True)
    ref, _ = _fused_ref(x, w, None, None, affine=False, act=None,
                        reflect=False, stats=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rrdb_fused_matches_off():
    """Whole RRDBNet through the interpret fused path == XLA path.
    Routing is the `fusion` module field (never a trace-time env read)."""
    from tpusr.models.rrdb import RRDBNet

    x = jnp.asarray(np.random.default_rng(7).random((1, 64, 64, 3)),
                    jnp.float32)
    net0 = RRDBNet(nf=64, nb=1, gc=32, scale=2, fusion="off")
    v = net0.init(jax.random.key(0), x)
    y0 = net0.apply(v, x)
    y1 = RRDBNet(nf=64, nb=1, gc=32, scale=2, fusion="interpret").apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-5)


def test_small_c_padded_operand():
    """128-lane zero-padded operand + logical (3,3,RC,M) kernel — the
    compiled small-C convention (fused_conv3x3 docstring)."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 96)) * 0.05, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 96)))
    y = fused_conv3x3(xp, w, pad_mode="zero", interpret=True)
    ref, _ = _fused_ref(x, w, None, None, affine=False, act=None,
                        reflect=False, stats=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # gradients flow through the padded operand (pad lanes get zero grad)
    g = jax.grad(lambda xp: jnp.sum(fused_conv3x3(
        xp, w, pad_mode="zero", interpret=True)))(xp)
    assert float(jnp.abs(g[..., 32:]).max()) == 0.0
    assert float(jnp.abs(g[..., :32]).max()) > 0.0


@pytest.mark.parametrize("cin", [64, 128])
def test_wide_image_2d_grid(cin):
    """W > 1024 rides the column overlap-discard path (_fwd_pallas_cols)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 64, 1280, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, 64)) * 0.05, jnp.float32)
    # round 3: wide shapes ARE auto-routed (8-aligned column windows on
    # the fast 1-D kernel); only stats epilogues stay unsupported wide
    assert fused_conv_supported(x.shape, 3, 1)
    assert not fused_conv_supported(x.shape, 3, 1, stats=True)
    y = fused_conv3x3(x, w, pad_mode="zero", interpret=True)
    ref, _ = _fused_ref(x, w, None, None, affine=False, act=None,
                        reflect=False, stats=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_image_2d_grid_act():
    """Wide column path with an affine+LeakyReLU prologue."""
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 64, 1280, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (128,)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    y = fused_conv3x3(x, w, es, eb, act="leaky_relu", pad_mode="zero",
                      interpret=True)
    ref, _ = _fused_ref(x, w, es, eb, affine=True, act="leaky_relu",
                        reflect=False, stats=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
