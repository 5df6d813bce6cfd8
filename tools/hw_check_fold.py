"""Real-TPU compile checks for the round-4 fold/tap-subset kernel shapes.

Interpreter tests validate math only — every new Pallas shape class needs
one hardware compile before trusting it (DESIGN.md Mosaic lowering rules).
Each case runs fwd and fwd+bwd at the exact D-dataflow geometry and
compares against the XLA reference; failures print the Mosaic error class
and continue.

Run on TPU: python tools/hw_check_fold.py
"""
import sys
sys.path.insert(0, "/root/repo")
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.ops.batch_fold import S2_TAPS, pack_s2_weights, space_to_depth2
from tpusr.ops.pallas_conv import _fused_ref, fused_conv3x3

# (label, packed x shape, RC(=Cin of kernel), Cout, taps)
# geometry = the folded-D canvases at the 192²/batch-8 reference workload
CASES = [
    # b0: rows-fold s2 pack; 64-lane OUTPUT block write (new on hardware)
    ("b0 s2pack out64", (1, 784, 96, 256), 256, 64, S2_TAPS),
    # b1: small-C operand (lane-padded) fwd + small-C dgrad G (pad_g path)
    ("b1 smallC 64->128", (1, 784, 96, 64), 64, 128, None),
    # b2: grid s2 pack, H=104
    ("b2 s2pack grid", (1, 104, 208, 512), 512, 128, S2_TAPS),
    # b4: packed 1024-channel operand
    ("b4 s2pack 1024ch", (1, 56, 112, 1024), 1024, 256, S2_TAPS),
    # b6: H=32 canvas (below the old H>=64 routing floor), 2048-ch K,
    # wgrad dw exceeds VMEM -> must take the mixed pallas-dgrad/XLA-wgrad
    ("b6 s2pack H32", (1, 32, 64, 2048), 2048, 512, S2_TAPS),
    # stage-B stride-1 at 256 channels
    ("b3 s1 grid", (1, 104, 208, 256), 256, 256, None),
]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    for label, xs, rc, co, taps in CASES:
        x = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, rc, co)) * 0.05, jnp.bfloat16)
        if taps is not None:
            mask = np.zeros((3, 3, 1, 1), np.float32)
            for t in taps:
                mask[t // 3, t % 3] = 1.0
            w = w * jnp.asarray(mask, jnp.bfloat16)

        def f(x, w, taps=taps):
            y = fused_conv3x3(x, w, pad_mode="zero", taps=taps)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        try:
            v = float(jax.jit(f)(x, w))
            want, _ = _fused_ref(x[..., :rc], w, None, None, affine=False,
                                 act=None, reflect=False, stats=False)
            wantv = float(jnp.sum(jnp.square(want.astype(jnp.float32))))
            rel = abs(v - wantv) / (abs(wantv) + 1e-9)
            assert rel < 2e-2, (v, wantv)
            print(f"{label}: fwd OK (rel {rel:.1e})", flush=True)
        except Exception as e:
            print(f"{label}: fwd FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        try:
            g = jax.jit(jax.grad(f, argnums=(0, 1)))(x, w)
            sync(g[0])
            gr, gw_ = jax.grad(
                lambda a, b: float(0) + jnp.sum(jnp.square(_fused_ref(
                    a[..., :rc], b, None, None, affine=False, act=None,
                    reflect=False, stats=False)[0].astype(jnp.float32))),
                argnums=(0, 1))(x, w)
            rel = float(jnp.abs(g[1].astype(jnp.float32)
                                - gw_.astype(jnp.float32)).max()
                        / (jnp.abs(gw_.astype(jnp.float32)).max() + 1e-9))
            assert rel < 5e-2, rel
            print(f"{label}: bwd OK (dw rel {rel:.1e})", flush=True)
        except Exception as e:
            print(f"{label}: bwd FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # the full folded D fwd+bwd at the reference workload
    try:
        from tpusr.engine import losses as L
        from tpusr.models.srgan import Discriminator
        from tpusr.models.srgan_folded import discriminator_apply_folded

        d = Discriminator(dtype="bfloat16")
        x = jnp.asarray(rng.uniform(-1, 1, (8, 192, 192, 3)), jnp.float32)
        v = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 192, 192, 3)))
        p, st = v["params"], v["batch_stats"]

        def dloss(p_):
            out, _ = discriminator_apply_folded(p_, st, x, True,
                                                dtype="bfloat16")
            return jnp.sum(jnp.square(out))

        val = float(jax.jit(dloss)(p))
        g = jax.jit(jax.grad(dloss))(p)
        sync(jax.tree_util.tree_leaves(g)[0])
        ref, _ = d.apply({"params": p, "batch_stats": st}, x, True,
                         mutable=["batch_stats"])
        refv = float(jnp.sum(jnp.square(ref)))
        print(f"folded D full: OK loss {val:.4f} vs flax {refv:.4f}",
              flush=True)
    except Exception:
        print("folded D full: FAILED", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
