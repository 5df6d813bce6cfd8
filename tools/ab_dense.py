"""A/B the discriminator dense-head dtype routing in a training-shaped loop.

The D head is (8, 73728) x (73728, 1024) + (8,1024) x (1024,1) with an f32
master weight; at M=8 it is weight-streaming bound. Current route casts the
master to bf16 each step (dtype=bf16 flax Dense); candidate routes the GEMM
directly on the f32 master (flax dtype=None promotion). Measures fwd+bwd+Adam
over a scan, per step.

Run on TPU: python tools/ab_dense.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax


def sync(x):
    return float(jnp.sum(x))


def run(dtype_mode: str, steps: int = 50, reps: int = 3):
    K, N = 73728, 1024
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.01, (K, N)), jnp.float32)
    b1 = jnp.zeros((N,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.01, (N, 1)), jnp.float32)
    b2 = jnp.zeros((1,), jnp.float32)
    params = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}
    x = jnp.asarray(rng.normal(0, 1, (8, K)), jnp.bfloat16)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    def head_one(pb, x):
        h = x @ pb["w1"] + pb["b1"]
        h = jnp.where(h > 0, h, 0.2 * h)
        o = h @ pb["w2"] + pb["b2"]
        return jnp.mean(o.astype(jnp.float32) ** 2)

    def head(p, x):
        if dtype_mode == "bf16":
            pb = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
            return head_one(pb, x)
        if dtype_mode == "f32":  # f32 promotion (flax dtype=None behavior)
            return head_one(p, x.astype(jnp.float32))
        # the real D applies its head THREE times per step (real batch,
        # fake batch, fake-for-G): does XLA CSE the f32->bf16 master-weight
        # cast across applies, or does hoisting it pay?
        xs = [x, x * 0.5, x * 0.25]
        if dtype_mode == "hoist_3":
            pb = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
            return sum(head_one(pb, xi) for xi in xs)
        # bf16_3: inline per-apply casts (the current engine structure)
        return sum(head_one({k: v.astype(jnp.bfloat16)
                             for k, v in p.items()}, xi) for xi in xs)

    @jax.jit
    def run_steps(params, opt_state, x):
        def body(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(head)(p, x)
            up, s = opt.update(g, s)
            p = optax.apply_updates(p, up)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=steps)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(p)), losses

    chk, _ = run_steps(params, opt_state, x)
    sync(chk)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        chk, _ = run_steps(params, opt_state, x)
        sync(chk)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{dtype_mode}: {best*1e3:.3f} ms/step (best of {reps})", flush=True)
    return best


if __name__ == "__main__":
    run("bf16")
    run("f32")
    run("bf16_3")
    run("hoist_3")
