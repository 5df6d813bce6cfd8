"""A/B the discriminator Adam moment dtype (GANTrainConfig.d_moments) on the
GAN train bench, plus loss-trajectory neutrality.

The 80M-param D sits at the optimizer bandwidth floor (~2.6 ms/step of pure
HBM traffic over m/v/param/grad, DESIGN.md "D dense head"); storing both
moments in bf16 cuts the Adam stream from 28 to 16 bytes/param. This tool
answers (on hardware, fresh subprocess per variant, interleaved):

  1. throughput: bench.py gan_train worker, f32 vs bf16, two rounds each;
  2. neutrality: 60 epochs on a fixed synthetic batch set, comparing the
     D/G loss trajectories and the first-epoch vs last-epoch loss drop.

Usage: python tools/ab_d_moments.py [--rounds 2]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")


def run_worker(moments: str) -> float:
    env = dict(os.environ)
    env["TPUSR_D_MOMENTS"] = moments
    env.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    proc = subprocess.run(
        [sys.executable, "bench.py", "--worker", "gan_train", "--iters", "0"],
        capture_output=True, text=True, timeout=1800, env=env)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            return float(rec["value"])
        except ValueError:
            continue
    raise RuntimeError(proc.stderr[-500:])


def neutrality(moments: str):
    """60 epochs on a fixed synthetic stack; returns the loss trajectories."""
    code = f"""
import json
import numpy as np
import jax, jax.numpy as jnp
from tpusr.engine.gan import GANTrainConfig, create_gan_state
from tpusr.engine.gan_epochs import gan_train_epochs
# pair d_params with the moment dtype (bf16 weight storage requires the f32
# update math that only the bf16-moment transform provides)
config = GANTrainConfig(factor=8, dtype="bfloat16", d_moments="{moments}",
                        d_params="{moments}")
state = create_gan_state(jax.random.key(0), config, config.pre_train_lr)
rng = np.random.default_rng(0)
n_img, lh, lw = 16, 96, 96
lr_u8 = jnp.asarray(rng.integers(0, 256, (n_img, lh, lw, 3)), jnp.uint8)
hr_u8 = jnp.asarray(rng.integers(0, 256, (n_img, lh*8, lw*8, 3)), jnp.uint8)
valid = jnp.full((n_img, 2), lh, jnp.int32)
state, logs = gan_train_epochs(state, lr_u8, hr_u8, valid, jax.random.key(1),
                               config, config.pre_train_lr, n_epochs=60)
ld = np.asarray(logs["losses_D"], np.float64).mean(axis=1)
lg = np.asarray(logs["losses_G"], np.float64).mean(axis=1)
print("NEUTRALITY", json.dumps({{
    "moments": "{moments}",
    "loss_D_first5": ld[:5].tolist(), "loss_D_last5": ld[-5:].tolist(),
    "loss_G_first5": lg[:5].tolist(), "loss_G_last5": lg[-5:].tolist()}}))
"""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1800, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("NEUTRALITY"):
            return json.loads(line[len("NEUTRALITY"):])
    raise RuntimeError(proc.stderr[-500:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--skip_neutrality", action="store_true")
    args = ap.parse_args()

    # interleave f32/bf16 to exclude tunnel drift
    for r in range(args.rounds):
        for m in (["f32", "bf16"] if r % 2 == 0 else ["bf16", "f32"]):
            pps = run_worker(m)
            print(f"round {r} d_moments={m}: {pps:.1f} patches/s", flush=True)

    if not args.skip_neutrality:
        for m in ("f32", "bf16"):
            rec = neutrality(m)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
