"""VGG19 feature extractor and LPIPS graph tests (random weights — the
pretrained files cannot be downloaded in this environment; these validate
shapes, preprocessing, and the metric structure)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.io.checkpoint import (
    export_torch_discriminator,
    import_torch_discriminator,
)
from tpusr.models.lpips import lpips_distance, _ALEX_CONVS
from tpusr.models.vgg19 import (
    vgg19_features,
    vgg19_layer_names,
    vgg_preprocess,
)


def _random_vgg_params(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    blocks = [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]
    for b, (ch, n) in enumerate(blocks, 1):
        for i in range(1, n + 1):
            params[f"conv{b}_{i}"] = {
                "kernel": jnp.asarray(
                    rng.normal(0, 0.05, (3, 3, cin, ch)), jnp.float32),
                "bias": jnp.zeros(ch),
            }
            cin = ch
    return params


def test_vgg19_layer_names():
    names = vgg19_layer_names()
    assert len(names) == 16
    assert names[0] == "conv1_1" and names[-1] == "conv5_4"


def test_vgg_preprocess_shapes_and_normalization():
    x = jnp.full((2, 192, 192, 3), 0.5)
    y = vgg_preprocess(x)
    assert y.shape == (2, 224, 224, 3)
    # (0.5 - mean)/std per ImageNet stats
    want = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], want, atol=1e-4)


def test_vgg19_feature_map_shape():
    params = _random_vgg_params()
    x = jnp.zeros((1, 224, 224, 3))
    # conv5_4 activation: after 4 pools -> 14x14x512 (features[:36] parity)
    f = vgg19_features(params, x, upto="conv5_4")
    assert f.shape == (1, 14, 14, 512)
    f3 = vgg19_features(params, x, upto="conv3_1")
    assert f3.shape == (1, 56, 56, 256)


def _random_lpips_params(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    for name, ch, k, _, _ in _ALEX_CONVS:
        params[name] = {
            "kernel": jnp.asarray(rng.normal(0, 0.05, (k, k, cin, ch)), jnp.float32),
            "bias": jnp.zeros(ch),
        }
        cin = ch
    for i, (_, ch, *_rest) in enumerate(_ALEX_CONVS):
        params[f"lin{i}"] = {"kernel": jnp.asarray(rng.uniform(0, 0.1, ch), jnp.float32)}
    return params


def test_lpips_zero_for_identical_and_positive_otherwise():
    params = _random_lpips_params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 64, 3)) * 2 - 1, jnp.float32)
    y = jnp.asarray(rng.random((1, 64, 64, 3)) * 2 - 1, jnp.float32)
    assert abs(float(lpips_distance(params, x, x))) < 1e-6
    assert float(lpips_distance(params, x, y)) > 0


def test_discriminator_export_roundtrip():
    rng = np.random.default_rng(2)
    sd = {}
    cin = 3
    sd["conv.weight"] = rng.normal(0, 0.05, (64, 3, 3, 3)).astype(np.float32)
    sd["conv.bias"] = np.zeros(64, np.float32)
    chans = [(64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 512), (512, 512)]
    for i, (ci, co) in enumerate(chans):
        sd[f"convblocks.{i}.conv1.weight"] = rng.normal(0, 0.05, (co, ci, 3, 3)).astype(np.float32)
        sd[f"convblocks.{i}.conv1.bias"] = np.zeros(co, np.float32)
        sd[f"convblocks.{i}.bn1.weight"] = np.ones(co, np.float32)
        sd[f"convblocks.{i}.bn1.bias"] = np.zeros(co, np.float32)
        sd[f"convblocks.{i}.bn1.running_mean"] = np.zeros(co, np.float32)
        sd[f"convblocks.{i}.bn1.running_var"] = np.ones(co, np.float32)
    sd["dense1.weight"] = rng.normal(0, 0.05, (1024, 512 * 4 * 4)).astype(np.float32)
    sd["dense1.bias"] = np.zeros(1024, np.float32)
    sd["dense2.weight"] = rng.normal(0, 0.05, (1, 1024)).astype(np.float32)
    sd["dense2.bias"] = np.zeros(1, np.float32)

    params, stats = import_torch_discriminator(sd, hr_patch=64)
    back = export_torch_discriminator(params, stats, hr_patch=64)
    for k, v in sd.items():
        np.testing.assert_allclose(back[k], v, atol=1e-6, err_msg=k)
