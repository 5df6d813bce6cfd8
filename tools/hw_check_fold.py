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
            gw1, gw2 = g[1].astype(jnp.float32), gw_.astype(jnp.float32)
            if taps is not None:
                # dead-tap dw is unspecified (zero on the Pallas wgrad,
                # full-conv value on the XLA fallback and on this full-conv
                # oracle); callers discard it (pack_s2_weights' VJP reads
                # live positions only) — compare live taps only.
                tm = jnp.asarray(mask, jnp.float32)
                gw1, gw2 = gw1 * tm, gw2 * tm
            rel = float(jnp.abs(gw1 - gw2).max()
                        / (jnp.abs(gw2).max() + 1e-9))
            assert rel < 5e-2, rel
            print(f"{label}: bwd OK (dw rel {rel:.1e})", flush=True)
        except Exception as e:
            print(f"{label}: bwd FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # the seam-masked prologue kernel (v2 building block): in-kernel iota
    # row/col masks + affine+act prologue + seam-exact stats, at the b1
    # geometry (incl. modulo-on-iota lowering — new on hardware)
    try:
        xs = (1, 784, 96, 64)
        x = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.05,
                        jnp.bfloat16)
        es = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
        eb = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)

        def f2(x, w, es, eb):
            y, st = fused_conv3x3(x, w, es, eb, act="leaky_relu",
                                  pad_mode="zero", stats=True,
                                  seam=(98, 96, 96, 96))
            return (jnp.sum(jnp.square(y.astype(jnp.float32)))
                    + 0.01 * jnp.sum(st))

        v = float(jax.jit(f2)(x, w, es, eb))
        want = float(jax.jit(lambda *a: (
            lambda y, st: jnp.sum(jnp.square(y.astype(jnp.float32)))
            + 0.01 * jnp.sum(st))(*_fused_ref(
                a[0], a[1], a[2], a[3], affine=True, act="leaky_relu",
                reflect=False, stats=True, seam=(98, 96, 96, 96))))(
                    x, w, es, eb))
        rel = abs(v - want) / (abs(want) + 1e-9)
        assert rel < 2e-2, (v, want)
        g = jax.jit(jax.grad(f2, argnums=(0, 1, 2, 3)))(x, w, es, eb)
        sync(g[1])
        print(f"seam+prologue kernel: OK (rel {rel:.1e})", flush=True)
    except Exception as e:
        print(f"seam+prologue kernel: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # PReLU prologue (traced scalar slope read from a (1,) VMEM operand —
    # new scalar-read pattern on hardware) at an eval-G body shape
    try:
        x = jnp.asarray(rng.normal(size=(1, 96, 96, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
        es = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
        eb = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
        al = jnp.asarray([0.25], jnp.float32)

        def fp(x, w, es, eb, al):
            y = fused_conv3x3(x, w, es, eb, act="prelu", prelu_alpha=al,
                              pad_mode="zero")
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        v = float(jax.jit(fp)(x, w, es, eb, al))
        want, _ = _fused_ref(x, w, es, eb, affine=True, act="prelu",
                             reflect=False, stats=False, alpha=al)
        wv = float(jnp.sum(jnp.square(want.astype(jnp.float32))))
        rel = abs(v - wv) / (abs(wv) + 1e-9)
        assert rel < 2e-2, (v, wv)
        print(f"prelu prologue: OK (rel {rel:.1e})", flush=True)
    except Exception as e:
        print(f"prelu prologue: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # the fully fused eval G at the bench workload shape
    try:
        from tpusr.models.srgan import Generator
        from tpusr.models.srgan_folded import generator_apply_fused_eval

        gm = Generator(dtype="bfloat16")
        lr = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)), jnp.float32)
        vg = gm.init(jax.random.PRNGKey(3), jnp.zeros((1, 24, 24, 3)))
        pg, stg = vg["params"], vg["batch_stats"]
        out = jax.jit(lambda p: generator_apply_fused_eval(
            p, stg, lr, 8, 16, dtype="bfloat16"))(pg)
        got = float(jnp.sum(jnp.square(out)))
        refo = gm.apply({"params": pg, "batch_stats": stg}, lr, False)
        refv = float(jnp.sum(jnp.square(refo)))
        rel = abs(got - refv) / (abs(refv) + 1e-9)
        assert rel < 5e-2, (got, refv)
        print(f"fused eval G: OK (rel {rel:.1e})", flush=True)
    except Exception:
        print("fused eval G: FAILED", flush=True)
        traceback.print_exc()

    # the full folded D fwd+bwd at the reference workload, v1 and v2
    from tpusr.models.srgan import Discriminator
    from tpusr.models.srgan_folded import (discriminator_apply_folded,
                                           discriminator_apply_folded_v2)

    d = Discriminator(dtype="bfloat16")
    x = jnp.asarray(rng.uniform(-1, 1, (8, 192, 192, 3)), jnp.float32)
    v = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 192, 192, 3)))
    p, st = v["params"], v["batch_stats"]
    ref, _ = d.apply({"params": p, "batch_stats": st}, x, True,
                     mutable=["batch_stats"])
    refv = float(jnp.sum(jnp.square(ref)))
    for name, fn in (("v1", discriminator_apply_folded),
                     ("v2", discriminator_apply_folded_v2)):
        try:
            def dloss(p_, fn=fn):
                out, _ = fn(p_, st, x, True, dtype="bfloat16")
                return jnp.sum(jnp.square(out))

            val = float(jax.jit(dloss)(p))
            g = jax.jit(jax.grad(dloss))(p)
            sync(jax.tree_util.tree_leaves(g)[0])
            print(f"folded D {name}: OK loss {val:.4f} vs flax {refv:.4f}",
                  flush=True)
        except Exception:
            print(f"folded D {name}: FAILED", flush=True)
            traceback.print_exc()

    # the full folded G fwd+bwd at the reference workload
    try:
        from tpusr.models.srgan import Generator
        from tpusr.models.srgan_folded import generator_apply_folded

        gm = Generator(dtype="bfloat16")
        lr = jnp.asarray(rng.uniform(0, 1, (8, 24, 24, 3)), jnp.float32)
        vg = gm.init(jax.random.PRNGKey(2), jnp.zeros((1, 24, 24, 3)))
        pg, stg = vg["params"], vg["batch_stats"]

        def gloss(p_):
            out, _ = generator_apply_folded(p_, stg, lr, 8, 16, train=True,
                                            dtype="bfloat16")
            return jnp.sum(jnp.square(out))

        val = float(jax.jit(gloss)(pg))
        gr = jax.jit(jax.grad(gloss))(pg)
        sync(jax.tree_util.tree_leaves(gr)[0])
        refg, _ = gm.apply({"params": pg, "batch_stats": stg}, lr, True,
                           mutable=["batch_stats"])
        refgv = float(jnp.sum(jnp.square(refg)))
        print(f"folded G: OK loss {val:.4f} vs flax {refgv:.4f}", flush=True)
    except Exception:
        print("folded G: FAILED", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
