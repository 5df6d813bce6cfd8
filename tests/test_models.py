"""Model parity tests: parameter counts, output shapes, and layer semantics
checked against torch oracles (torch is CPU-only in this image and used as a
golden reference, never at runtime).

Golden parameter counts were measured from the reference architectures:
  skip (DIP.py:169-174 config)            2,217,831
  Generator(factor=8)                      1,697,175
  Generator(factor=16)                     1,844,888
  Discriminator((192,192))                80,188,609
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from tpusr.models import Discriminator, Generator, build_dip_net
from tpusr.models.layers import BatchNorm, Conv, pixel_shuffle, upsample2x


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


# ---------------------------------------------------------------------------
# Parameter-count / shape parity
# ---------------------------------------------------------------------------

def test_skip_net_param_count_and_shape():
    net = build_dip_net()
    x = jnp.zeros((1, 96, 96, 32))
    variables = net.init(jax.random.key(0), x)
    assert n_params(variables["params"]) == 2_217_831
    y = net.apply(variables, x, mutable=["batch_stats"])[0]
    assert y.shape == (1, 96, 96, 3)


def test_skip_net_odd_input_keeps_spatial_size():
    net = build_dip_net()
    x = jnp.zeros((1, 100, 100, 32))
    variables = net.init(jax.random.key(0), x)
    y = net.apply(variables, x, mutable=["batch_stats"])[0]
    assert y.shape == (1, 100, 100, 3)


@pytest.mark.parametrize("factor,count", [(8, 1_697_175), (16, 1_844_888)])
def test_generator_param_count(factor, count):
    g = Generator(factor=factor)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    assert n_params(variables["params"]) == count


def test_generator_output_shape_and_range():
    g = Generator(factor=8)
    x = jax.random.uniform(jax.random.key(1), (2, 24, 24, 3))
    variables = g.init(jax.random.key(0), x)
    y = g.apply(variables, x, mutable=["batch_stats"])[0]
    assert y.shape == (2, 192, 192, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_discriminator_param_count_and_logits():
    d = Discriminator()
    x = jnp.zeros((2, 192, 192, 3))
    variables = d.init(jax.random.key(0), x)
    assert n_params(variables["params"]) == 80_188_609
    logits = d.apply(variables, x, mutable=["batch_stats"])[0]
    assert logits.shape == (2, 1)


# ---------------------------------------------------------------------------
# Layer semantics vs torch oracles
# ---------------------------------------------------------------------------

def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 5, 7)).astype(np.float32)  # NCHW
    want = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilinear_upsample_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 9, 13)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear",
                         align_corners=False).numpy()
    got = upsample2x(jnp.asarray(x.transpose(0, 2, 3, 1)), "bilinear")
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("h,w,c", [(2, 2, 1), (3, 5, 2), (7, 2, 4), (16, 9, 2)])
def test_bilinear_upsample_custom_vjp_matches_autodiff(h, w, c):
    """The closed-form adjoint (layers._linear2x_axis_adj) must equal
    autodiff of the interleave forward, including the edge clamps."""
    from tpusr.models.layers import _bilinear2x, _linear2x_axis

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 2 * h, 2 * w, c)).astype(np.float32))

    def ref(x):
        return _linear2x_axis(_linear2x_axis(x, 1), 2)

    y_new, vjp_new = jax.vjp(_bilinear2x, x)
    y_ref, vjp_ref = jax.vjp(ref, x)
    np.testing.assert_array_equal(np.asarray(y_new), np.asarray(y_ref))
    np.testing.assert_allclose(np.asarray(vjp_new(g)[0]),
                               np.asarray(vjp_ref(g)[0]), atol=1e-5)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, 4, 6)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = upsample2x(jnp.asarray(x.transpose(0, 2, 3, 1)), "nearest")
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("pad_mode,stride", [("zero", 1), ("zero", 2),
                                             ("reflection", 1), ("reflection", 2)])
def test_conv_matches_torch(pad_mode, stride):
    rng = np.random.default_rng(3)
    cin, cout, k = 5, 7, 3
    x = rng.standard_normal((2, cin, 11, 13)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)

    xt = torch.from_numpy(x)
    if pad_mode == "reflection":
        xt = F.pad(xt, (1, 1, 1, 1), mode="reflect")
        want = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), stride=stride).numpy()
    else:
        want = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b),
                        stride=stride, padding=1).numpy()

    conv = Conv(cout, k, stride=stride, pad_mode=pad_mode)
    variables = conv.init(jax.random.key(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    variables = jax.tree.map(lambda a: a, variables)  # unfreeze-safe copy
    variables["params"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    variables["params"]["bias"] = jnp.asarray(b)
    got = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(4)
    x1 = rng.standard_normal((4, 6, 5, 3)).astype(np.float32)  # NHWC
    x2 = rng.standard_normal((4, 6, 5, 3)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor([1.5, 0.5, 2.0]))
        tbn.bias.copy_(torch.tensor([0.1, -0.2, 0.3]))

    bn = BatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x1))
    variables = jax.tree.map(lambda a: a, variables)
    variables["params"]["scale"] = jnp.asarray([1.5, 0.5, 2.0])
    variables["params"]["bias"] = jnp.asarray([0.1, -0.2, 0.3])

    # two train steps (stats accumulate), then eval
    stats = variables["batch_stats"]
    for x in (x1, x2):
        want = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        got, updates = bn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), False, mutable=["batch_stats"])
        stats = updates["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)

    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), atol=1e-5)

    tbn.eval()
    want = tbn(torch.from_numpy(x1.transpose(0, 3, 1, 2))).detach().numpy()
    got = bn.apply({"params": variables["params"], "batch_stats": stats},
                   jnp.asarray(x1), True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_torch_style_init_distribution():
    """Conv kernels/biases ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    conv = Conv(64, 3)
    variables = conv.init(jax.random.key(0), jnp.zeros((1, 16, 16, 32)))
    k = np.asarray(variables["params"]["kernel"])
    bound = 1.0 / np.sqrt(3 * 3 * 32)
    assert np.abs(k).max() <= bound
    assert np.abs(k).max() > 0.9 * bound  # actually fills the range
    assert abs(k.mean()) < 0.1 * bound


# ---------------------------------------------------------------------------
# TPU layout fast paths (identical-math guarantees)
# ---------------------------------------------------------------------------

def test_banded_conv_matches_plain():
    """Batch-1 tall inputs take the space-to-batch banded path; batch-2
    inputs take the plain path. Same weights => same result, all pad modes
    and strides."""
    from tpusr.models.layers import conv_apply

    rng = np.random.default_rng(10)
    for k, H in [(3, 512), (9, 512), (3, 500)]:  # 9x9 = SRGAN head/tail
        x = jnp.asarray(rng.standard_normal((1, H, 96, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, 8, 16)) * 0.1, jnp.float32)
        for pad_mode in ("zero", "reflection"):
            for stride in (1, 2):
                if H % stride:
                    continue
                banded = conv_apply(x, w, stride, pad_mode)
                plain = conv_apply(jnp.concatenate([x, x], 0), w, stride,
                                   pad_mode)[:1]
                np.testing.assert_allclose(np.asarray(banded),
                                           np.asarray(plain), atol=1e-5)


def test_thin_cout_conv_matches_plain():
    """Small-Cout stride-1 zero-pad convs (the SRGAN 9x9 64->3 head) take
    the tap-packed GEMM route (_conv_thin_cout): forward and both custom-VJP
    gradients must match the lax conv to f32 roundoff."""
    from tpusr.models.layers import _conv_thin_cout, _thin_cout_ok, conv_apply

    rng = np.random.default_rng(12)
    assert _thin_cout_ok((8, 192, 192, 64), 9, 3, 1, "zero")
    assert not _thin_cout_ok((1, 512, 512, 64), 3, 3, 1, "zero")  # N=27
    assert not _thin_cout_ok((8, 192, 192, 64), 9, 3, 1, "reflection")
    assert not _thin_cout_ok((8, 192, 192, 64), 9, 3, 2, "zero")

    for n, H, W, ci, co, k in [(2, 24, 20, 64, 3, 9), (1, 40, 33, 16, 8, 3)]:
        x = jnp.asarray(rng.standard_normal((n, H, W, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.float32)
        p = k // 2
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _conv_thin_cout(x, w, "zero")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
        # conv_apply routes there (same values)
        if _thin_cout_ok(x.shape, k, co, 1, "zero"):
            np.testing.assert_allclose(
                np.asarray(conv_apply(x, w, 1, "zero")), np.asarray(ref),
                atol=2e-4)

        def loss_ref(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(jnp.sin(y))

        def loss_thin(x, w):
            return jnp.sum(jnp.sin(_conv_thin_cout(x, w, "zero")))

        g_ref = jax.grad(loss_ref, (0, 1))(x, w)
        g_thin = jax.grad(loss_thin, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g_thin[0]),
                                   np.asarray(g_ref[0]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(g_thin[1]),
                                   np.asarray(g_ref[1]), atol=2e-3)


def test_split_conv_and_bn_match_monolithic():
    """SplitConv/SplitBatchNorm over [skip(4), trunk(128)] == monolithic
    conv/BN over the 132-channel concat (the skip-merge rewrite)."""
    from tpusr.models.layers import SplitBatchNorm, SplitConv, conv_apply

    rng = np.random.default_rng(11)
    s = jnp.asarray(rng.standard_normal((1, 32, 32, 4)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((1, 32, 32, 128)), jnp.float32)
    cat = jnp.concatenate([s, d], -1)

    sc = SplitConv(16, 3, (4, 128), pad_mode="reflection")
    v = sc.init(jax.random.key(0), [s, d])
    assert v["params"]["kernel"].shape == (3, 3, 132, 16)  # monolithic shape
    got = sc.apply(v, [s, d])
    want = conv_apply(cat, v["params"]["kernel"], 1, "reflection") \
        + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    sbn = SplitBatchNorm((4, 128))
    vb = sbn.init(jax.random.key(1), [s, d])
    assert vb["params"]["scale"].shape == (132,)
    outs, mut = sbn.apply(vb, [s, d], False, mutable=["batch_stats"])
    bn = BatchNorm()
    vb2 = bn.init(jax.random.key(2), cat)
    want_out, mut2 = bn.apply(vb2, cat, False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, -1)),
                               np.asarray(want_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               np.asarray(mut2["batch_stats"]["var"]),
                               atol=1e-6)


def test_conv1x1_dot_path_matches_torch():
    """The 1x1-as-dot fast path against a torch conv oracle."""
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 9, 7, 12)).astype(np.float32)
    w = rng.standard_normal((5, 12, 1, 1)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(w), torch.from_numpy(b)).numpy()
    conv = Conv(5, 1)
    variables = conv.init(jax.random.key(0), jnp.asarray(x))
    variables = jax.tree.map(lambda a: a, variables)
    variables["params"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    variables["params"]["bias"] = jnp.asarray(b)
    got = np.asarray(conv.apply(variables, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)
