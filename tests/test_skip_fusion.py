"""Fused-conv SkipNet dataflow (conv_fusion='interpret') vs the pure-XLA path.

The fused wiring reroutes real computation: BN normalize+activation move into
the next conv's Pallas prologue, BN reductions are replaced by the conv's
stats epilogue with the conv bias folded analytically (layers.py BatchNorm
conv_stats). These tests pin the whole rerouted dataflow — outputs, running
statistics, and gradients — against the monolithic path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusr.models.skip import SkipNet


def _nets(**kw):
    base = dict(
        num_input_channels=8,
        num_output_channels=3,
        num_channels_down=(128, 128),
        num_channels_up=(128, 128),
        num_channels_skip=(4, 4),
        pad="reflection",
        upsample_mode="bilinear",
        act_fun="LeakyReLU",
    )
    base.update(kw)
    off = SkipNet(conv_fusion="off", **base)
    fused = SkipNet(conv_fusion="interpret", **base)
    return off, fused


@pytest.mark.parametrize("pad", ["reflection", "zero"])
def test_fused_skipnet_matches_unfused(pad):
    off, fused = _nets(pad=pad)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 256, 8))
    variables = off.init(jax.random.PRNGKey(1), x)

    y0, v0 = off.apply(variables, x, mutable=["batch_stats"])
    y1, v1 = fused.apply(variables, x, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-5)
    # running stats: the conv-stats epilogue + bias folding must reproduce
    # the monolithic BN bookkeeping (incl. the unbiased-variance update)
    flat0 = jax.tree_util.tree_leaves_with_path(v0["batch_stats"])
    flat1 = dict(jax.tree_util.tree_leaves_with_path(v1["batch_stats"]))
    # dict() of path->leaf for comparison
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(v1["batch_stats"])}
    for k, v in flat0:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat1[ks]), np.asarray(v),
                                   rtol=2e-4, atol=1e-5, err_msg=ks)


def test_fused_skipnet_gradients_match():
    off, fused = _nets()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 256, 8))
    variables = off.init(jax.random.PRNGKey(1), x)
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss(net, p):
        y, _ = net.apply({"params": p, "batch_stats": stats}, x,
                         mutable=["batch_stats"])
        return jnp.mean(jnp.square(y))

    g0 = jax.grad(lambda p: loss(off, p))(params)
    g1 = jax.grad(lambda p: loss(fused, p))(params)
    flat0 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g0)}
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    for ks, v in flat0.items():
        np.testing.assert_allclose(np.asarray(flat1[ks]), np.asarray(v),
                                   rtol=5e-4, atol=3e-6, err_msg=ks)


def test_fused_skipnet_bf16():
    off, fused = _nets(dtype="bfloat16")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 256, 8))
    variables = off.init(jax.random.PRNGKey(1), x)
    y0 = off.apply(variables, x, mutable=["batch_stats"])[0]
    y1 = fused.apply(variables, x, mutable=["batch_stats"])[0]
    # bf16 activations: the fused kernel's stats come from pre-rounding f32
    # conv outputs (strictly more accurate than the XLA path's post-rounding
    # reduction) — tolerances sized for bf16 rounding noise
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_param_tree_unchanged_by_fusion():
    off, fused = _nets()
    x = jnp.zeros((1, 256, 256, 8))
    v0 = off.init(jax.random.PRNGKey(1), x)
    v1 = fused.init(jax.random.PRNGKey(1), x)
    s0 = jax.tree_util.tree_structure(v0)
    s1 = jax.tree_util.tree_structure(v1)
    assert s0 == s1
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape
