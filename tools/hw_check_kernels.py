"""Real-TPU compile checks for the fused Pallas conv's shape classes.

Interpreter tests validate math only — any change to the kernel's operand
list or lowering structure needs one hardware compile per shape class
before trusting it (DESIGN.md Mosaic lowering rules). Covers the routed
classes: DIP-style reflect conv with affine+LeakyReLU prologue and stats
epilogue (fwd+bwd), base-input epilogue, small-C operands through both
grad directions, the wide-W column path, and the auto-fused eval
generator at the bench workload shape.

Run on TPU: python tools/hw_check_kernels.py
"""
import sys
sys.path.insert(0, "/root/repo")
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.ops.pallas_conv import _fused_ref, fused_conv3x3


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def check_conv(label, xs, co, *, affine, act, reflect, stats, bwd=True):
    rng = np.random.default_rng(0)
    ci = xs[-1]
    x = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.05, jnp.bfloat16)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (ci,)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(ci,)) * 0.1, jnp.float32)
    pm = "reflection" if reflect else "zero"
    esv, ebv = (es, eb) if affine else (None, None)

    def f(x, w):
        out = fused_conv3x3(x, w, esv, ebv, act=act, pad_mode=pm,
                            stats=stats)
        if stats:
            y, st = out
            return jnp.sum(jnp.square(y.astype(jnp.float32))) + \
                0.01 * jnp.sum(st)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def fr(x, w):
        y, st = _fused_ref(x, w, esv, ebv, affine=affine, act=act,
                           reflect=reflect, stats=stats)
        v = jnp.sum(jnp.square(y.astype(jnp.float32)))
        return v + 0.01 * jnp.sum(st) if stats else v

    try:
        v = float(jax.jit(f)(x, w))
        want = float(jax.jit(fr)(x, w))
        rel = abs(v - want) / (abs(want) + 1e-9)
        assert rel < 2e-2, (v, want)
        print(f"{label}: fwd OK (rel {rel:.1e})", flush=True)
    except Exception as e:
        print(f"{label}: fwd FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    if not bwd:
        return
    try:
        g = jax.jit(jax.grad(f, argnums=(0, 1)))(x, w)
        sync(g[0])
        gr = jax.jit(jax.grad(fr, argnums=(0, 1)))(x, w)
        rel = float(jnp.abs(g[1].astype(jnp.float32)
                            - gr[1].astype(jnp.float32)).max()
                    / (jnp.abs(gr[1].astype(jnp.float32)).max() + 1e-9))
        assert rel < 5e-2, rel
        print(f"{label}: bwd OK (dw rel {rel:.1e})", flush=True)
    except Exception as e:
        print(f"{label}: bwd FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    # the DIP hot class: reflect + prologue + stats epilogue
    check_conv("dip reflect+prologue+stats", (1, 512, 512, 128), 128,
               affine=True, act="leaky_relu", reflect=True, stats=True)
    # plain zero-pad (the auto_fuse route's class)
    check_conv("plain zero-pad", (1, 512, 512, 128), 128,
               affine=False, act=None, reflect=False, stats=False)
    # small-C operand through fwd + both grad directions
    check_conv("smallC 64->128", (1, 256, 256, 64), 128,
               affine=False, act=None, reflect=False, stats=False)
    check_conv("smallC 64->64", (1, 256, 256, 64), 64,
               affine=False, act=None, reflect=False, stats=False)
    # wide-W column overlap-discard path (fwd only — bwd falls back)
    check_conv("wide-W 1920 cols", (1, 128, 1920, 128), 128,
               affine=False, act=None, reflect=False, stats=False,
               bwd=False)

    # the auto-fused eval G at the bench workload shape
    try:
        from tpusr.engine.gan import GANTrainConfig, generator_forward
        from tpusr.models.srgan import Generator

        cfg = GANTrainConfig(factor=8, residual_blocks_count=16,
                             dtype="bfloat16")
        gm = Generator(factor=8, residual_blocks_count=16, dtype="bfloat16")
        rng = np.random.default_rng(3)
        lr = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)), jnp.float32)
        v = gm.init(jax.random.PRNGKey(3), jnp.zeros((1, 24, 24, 3)))
        out = jax.jit(lambda p: generator_forward(
            p, v["batch_stats"], lr, cfg))(v["params"])
        got = float(jnp.sum(jnp.square(out)))
        ref = gm.apply(v, lr, False)
        refv = float(jnp.sum(jnp.square(ref)))
        rel = abs(got - refv) / (abs(refv) + 1e-9)
        assert rel < 5e-2, (got, refv)
        print(f"auto-fused eval G: OK (rel {rel:.1e})", flush=True)
    except Exception:
        print("auto-fused eval G: FAILED", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
