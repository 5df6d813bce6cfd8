"""Shape-bucketed DIP: no recompile across different shapes in a bucket,
masked loss/metrics behave, padded result crops to a sane image."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.engine.dip import (
    dip_superresolve_bucketed,
    pad_to_bucket,
)
from tpusr.engine.metrics import psnr, psnr_masked, ssim, ssim_masked
from tests.test_dip_engine import TINY, _make_pair


def test_masked_metrics_equal_unmasked_on_exact_fit():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    v = jnp.asarray([32, 32])
    assert abs(float(psnr_masked(a, b, v, 1.0)) - float(psnr(a, b, 1.0))) < 1e-4
    # default: data_range inferred from the valid target region (torchmetrics)
    assert abs(float(psnr_masked(a, b, v)) - float(psnr(a, b))) < 1e-4
    assert abs(float(ssim_masked(a, b, v)) - float(ssim(a, b))) < 1e-5


def test_masked_metrics_ignore_padding():
    rng = np.random.default_rng(1)
    a = rng.random((1, 32, 32, 3)).astype(np.float32)
    b = rng.random((1, 32, 32, 3)).astype(np.float32)
    ap = np.pad(a, ((0, 0), (0, 16), (0, 8), (0, 0)))
    bp = np.pad(b, ((0, 0), (0, 16), (0, 8), (0, 0)))
    # corrupt the padded region of one input — metrics must not care
    ap[:, 32:, :, :] = 0.789
    v = jnp.asarray([32, 32])
    assert abs(float(psnr_masked(jnp.asarray(ap), jnp.asarray(bp), v, 1.0))
               - float(psnr(jnp.asarray(a), jnp.asarray(b), 1.0))) < 1e-4


def test_pad_to_bucket():
    x = np.ones((50, 70, 3))
    p, (h, w) = pad_to_bucket(x, 32)
    assert p.shape == (64, 96, 3)
    assert (h, w) == (50, 70)
    np.testing.assert_array_equal(p[:50, :70], x)
    assert p[50:].sum() == 0


def test_scan_bucketed_matches_single_runs():
    """lax.map grouped DIP == per-image bucketed runs with the same keys."""
    from tpusr.engine.dip import dip_superresolve_scan_bucketed

    f = TINY.factor
    lrs, hrs, valids = [], [], []
    for seed, (h, w) in enumerate([(40, 44), (36, 48)]):
        lr, hr = _make_pair(h=h, w=w, factor=f, seed=seed)
        hr_pad, (th, tw) = pad_to_bucket(np.asarray(hr)[0], 16)
        lr_np = np.asarray(lr)[0]
        lth, ltw = hr_pad.shape[0] // f, hr_pad.shape[1] // f
        lr_pad = np.pad(lr_np, ((0, lth - lr_np.shape[0]),
                                (0, ltw - lr_np.shape[1]), (0, 0)))
        lrs.append(lr_pad)
        hrs.append(hr_pad)
        valids.append((th, tw))
    lr_b = jnp.asarray(np.stack(lrs))[:, None]
    hr_b = jnp.asarray(np.stack(hrs))[:, None]
    valid = np.asarray(valids, np.int32)
    keys = jax.random.split(jax.random.key(5), 2)

    res_b, curves_b = dip_superresolve_scan_bucketed(
        lr_b, hr_b, valid, keys, TINY)

    for i in range(2):
        r1, c1 = dip_superresolve_bucketed(
            lr_b[i], hr_b[i], valid[i], keys[i], TINY)
        np.testing.assert_allclose(np.asarray(res_b[i]), np.asarray(r1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(curves_b["psnr"])[i],
                                   np.asarray(c1["psnr"]), atol=1e-3)


def test_bucketed_dip_one_compile_two_shapes():
    """Two images of different true sizes share one padded program."""
    f = TINY.factor
    bucket = 16
    results = []
    for (h, w) in ((40, 44), (36, 48)):
        lr, hr = _make_pair(h=h, w=w, factor=f)
        hr_np = np.asarray(hr)[0]
        hr_pad, (th, tw) = pad_to_bucket(hr_np, bucket)
        lth, ltw = hr_pad.shape[0] // f, hr_pad.shape[1] // f
        lr_np = np.asarray(lr)[0]
        lr_pad = np.pad(lr_np, ((0, lth - lr_np.shape[0]),
                                (0, ltw - lr_np.shape[1]), (0, 0)))
        resolved, curves = dip_superresolve_bucketed(
            jnp.asarray(lr_pad)[None], jnp.asarray(hr_pad)[None],
            np.asarray([th, tw], np.int32), jax.random.key(0), TINY)
        assert resolved.shape[1:3] == hr_pad.shape[:2]
        psnrs = np.asarray(curves["psnr"])
        assert np.all(np.isfinite(psnrs))
        assert psnrs[-1] > psnrs[0]
        results.append(resolved[:, :th, :tw])
    # both shapes padded to (48, 48): the jit cache must hold ONE entry
    cache = dip_superresolve_bucketed._cache_size()
    assert cache == 1, f"expected 1 compiled program, got {cache}"
    assert results[0].shape == (1, 40, 44, 3)
    assert results[1].shape == (1, 36, 48, 3)
