"""Measure + profile the GAN train step at the reference workload
(batch 8, 192² HR patches, factor 8, 16 blocks, D+G step) inside the
on-device epoch scan — VERDICT #3."""
import sys
sys.path.insert(0, ".")
import glob
import gzip
import json
import time
import collections

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


def main():
    from bench import bench_gan_train_patches

    pps = bench_gan_train_patches()
    print(f"gan_train_patches_per_sec: {pps:.1f} "
          f"({1000 * 8 / pps:.1f} ms/step)", flush=True)

    # trace one 10-epoch run for the step breakdown
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
                                  config.pre_train_lr, n_epochs=10)
        leaves = (jax.tree_util.tree_leaves(st2.params_G)
                  + jax.tree_util.tree_leaves(st2.params_D))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    run = jax.jit(run_fn)
    for i in range(2):
        sync(run(state, jax.random.key(i)))
    with jax.profiler.trace("/tmp/gan_trace"):
        sync(run(state, jax.random.key(2)))

    fn = sorted(glob.glob("/tmp/gan_trace/**/*.trace.json.gz",
                          recursive=True))[-1]
    ev = json.load(gzip.open(fn))["traceEvents"]
    dev = [e for e in ev if e.get("pid") == 3 and e.get("tid") == 3
           and "dur" in e]
    w = max((e for e in dev if e["name"].startswith("while.")),
            key=lambda e: e["dur"])
    nsteps = 10 * (16 // config.batch_size)  # epochs * steps/epoch
    print(f"while: {w['dur']/1e3:.1f} ms total -> "
          f"{w['dur']/nsteps/1e3:.3f} ms/step device", flush=True)
    t0, t1 = w["ts"], w["ts"] + w["dur"]
    inw = [e for e in dev if t0 <= e["ts"] < t1 and e is not w]
    agg = collections.Counter()
    nsrc = collections.Counter()
    for e in inw:
        a = e.get("args", {})
        src = a.get("source") or "?"
        agg[src] += e["dur"]
        nsrc[src] += 1
    for s, d in agg.most_common(20):
        print(f"{d/nsteps/1e3:7.3f} ms/step {nsrc[s]/nsteps:7.1f}/step  "
              f"{s[:100]}", flush=True)
    byname = collections.Counter()
    for e in inw:
        byname[e["name"]] += e["dur"]
    print("--- top ops", flush=True)
    for n, d in byname.most_common(15):
        print(f"{d/nsteps/1e3:7.3f} ms/step  {n}", flush=True)


if __name__ == "__main__":
    main()
