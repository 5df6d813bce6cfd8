"""A/B the gan_train bench's steps-per-dispatch against per-dispatch overhead.

Production (cli/train_gan.py) dispatches one on-device scan per
--train_log_freq chunk: at the reference DIV2K workload that is 100 epochs
x 100 steps = 10,000 steps per dispatch (train_GAN.py:97's log cadence).
bench.py uses a 16-image stack, so its chunk size in *epochs* must be much
larger to reach the same amortization of the fixed per-dispatch cost
(program launch over the tunneled runtime + the metrics-epoch extras).

This tool measures wall ms/step at several chunk sizes, interleaved over
rounds to exclude drift, so bench.py's n_epochs can be set to a measured
(not guessed) point on the amortization curve.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


def make_run(n_epochs):
    from tpusr.engine.gan import GANTrainConfig, create_gan_state
    from tpusr.engine.gan_epochs import gan_train_epochs

    config = GANTrainConfig(factor=8, dtype="bfloat16")
    state = create_gan_state(jax.random.key(0), config, config.pre_train_lr)
    rng = np.random.default_rng(0)
    n_img, lh, lw = 16, 96, 96
    lr_u8 = jnp.asarray(rng.integers(0, 256, (n_img, lh, lw, 3)), jnp.uint8)
    hr_u8 = jnp.asarray(
        rng.integers(0, 256, (n_img, lh * 8, lw * 8, 3)), jnp.uint8)
    valid = jnp.full((n_img, 2), lh, jnp.int32)

    def run_fn(st, k):
        st2, _ = gan_train_epochs(st, lr_u8, hr_u8, valid, k, config,
                                  config.pre_train_lr, n_epochs=n_epochs)
        leaves = (jax.tree_util.tree_leaves(st2.params_G)
                  + jax.tree_util.tree_leaves(st2.params_D))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    run = jax.jit(run_fn)
    nsteps = n_epochs * (n_img // config.batch_size)
    return run, state, nsteps, config.batch_size


def main():
    chunk_sizes = [100, 300, 600]
    runs = {}
    for n in chunk_sizes:
        run, state, nsteps, batch = make_run(n)
        # 1st call compiles; 2nd recompiles once for the returned layouts
        for i in range(2):
            sync(run(state, jax.random.key(i)))
        runs[n] = (run, state, nsteps, batch)
        print(f"warmed n_epochs={n} ({nsteps} steps/dispatch)", flush=True)

    for rnd in range(2):
        order = chunk_sizes if rnd % 2 == 0 else chunk_sizes[::-1]
        for n in order:
            run, state, nsteps, batch = runs[n]
            t0 = time.perf_counter()
            sync(run(state, jax.random.key(2 + rnd)))
            dt = time.perf_counter() - t0
            pps = nsteps * batch / dt
            print(f"round {rnd} n_epochs={n:4d}: {dt*1000/nsteps:7.3f} "
                  f"ms/step wall = {pps:6.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
