"""A/B bench: stride-2 down-conv strategies on the DIP shapes.

The DIP trace shows the stride-2 down convs (XLA banded path) running at
~5 TF/s across fwd+bwd (~0.9 ms/iter of ~0.1 ms of FLOPs). Candidates:
  banded2   — current: _banded_conv with stride 2
  plain2    — plain lax.conv stride 2 (no banding)
  s1slice   — banded stride-1 conv + [::2, ::2] slice (4x the MACs, but
              rides the fast stride-1 lowering)
  pallas1   — Pallas fused stride-1 kernel + slice (only Cin%128==0/32/64)
Each timed fwd and fwd+vjp inside an on-device scan.
"""
import sys
sys.path.insert(0, ".")
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.layers import _banded_conv, _pick_bands, conv_apply
from tpusr.ops.pallas_conv import fused_conv3x3, fused_conv_supported


def sync(x):
    return float(jnp.sum(x))


def banded2(x, k):
    return conv_apply(x, k, 2, "reflection")


def plain2(x, k):
    p = 1
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s1slice(x, k):
    y = conv_apply(x, k, 1, "reflection")
    return y[:, ::2, ::2]


def pallas1(x, k):
    y = fused_conv3x3(x, k, pad_mode="reflection")
    return y[:, ::2, ::2]


def bench(name, fn, x, k, reps=40):
    fwd = jax.jit(fn)

    def grad_fn(a, b):
        l, vjp = jax.vjp(lambda a, b: jnp.sum(fn(a, b).astype(jnp.float32)
                                              ** 2), a, b)
        return vjp(jnp.float32(1.0))

    bwd = jax.jit(grad_fn)
    out = {}
    for tag, f, args in [("fwd", fwd, (x, k)), ("fwd+bwd", bwd, (x, k))]:
        try:
            r = f(*args)
            sync(r[0] if isinstance(r, tuple) else r)
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(*args)
            sync(r[0] if isinstance(r, tuple) else r)
            dt = (time.perf_counter() - t0) / reps
            out[tag] = dt * 1e3
        except Exception as e:
            out[tag] = f"fail: {str(e)[:60]}"
    print(f"{name:8s} " + "  ".join(
        f"{t}: {v:.3f} ms" if isinstance(v, float) else f"{t}: {v}"
        for t, v in out.items()), flush=True)


def main():
    rng = np.random.default_rng(0)
    shapes = [(512, 32, 128), (256, 128, 128), (128, 128, 128)]
    for H, Cin, Cout in shapes:
        x = jnp.asarray(rng.standard_normal((1, H, H, Cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.bfloat16)
        print(f"--- ({H},{H},{Cin})->{Cout} stride2", flush=True)
        # numerics cross-check ON DEVICE (np.asarray of MBs over the
        # tunnel takes tens of minutes)
        checks = [("plain2", plain2), ("s1slice", s1slice)]
        if fused_conv_supported(x.shape, 3, 1):
            checks.append(("pallas1", pallas1))
        err = jax.jit(lambda x, k: jnp.stack(
            [jnp.abs(fn(x, k).astype(jnp.float32)
                     - banded2(x, k).astype(jnp.float32)).max()
             for _, fn in checks]))(x, k)
        for (nm, _), e in zip(checks, np.asarray(err)):
            print(f"  err[{nm}] = {e:.2e}", flush=True)
            assert e < 5e-2, (nm, e)
        bench("banded2", banded2, x, k)
        bench("plain2", plain2, x, k)
        bench("s1slice", s1slice, x, k)
        if fused_conv_supported(x.shape, 3, 1):
            bench("pallas1", pallas1, x, k)


if __name__ == "__main__":
    main()
