"""A/B the discriminator LARGE-weight storage dtype (GANTrainConfig.d_params)
on the GAN train bench, plus loss-trajectory neutrality.

The D step is weight-streaming bound: the 75.5M-element dense-1 kernel is
read by the forward GEMM, read again by dgrad, written by wgrad, and then
read+written by Adam (DESIGN.md "D dense head at its bandwidth floor").
d_params='bf16' stores the >=1M-element D weights in bfloat16 (update math
stays f32 via apply_updates' cast-back; requires the default bf16 moments),
halving every one of those HBM streams. This tool answers (on hardware,
fresh subprocess per variant, interleaved to exclude tunnel drift):

  1. throughput: bench.py gan_train worker, f32 vs bf16, N rounds each;
  2. neutrality: 60 epochs on a fixed synthetic stack, comparing the D/G
     loss trajectories (same protocol that routed d_moments in round 4).

Usage: python tools/ab_d_params.py [--rounds 2] [--skip_neutrality]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_worker(d_params: str) -> float:
    env = dict(os.environ)
    env["TPUSR_D_PARAMS"] = d_params
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


def neutrality(d_params: str):
    """60 epochs on a fixed synthetic stack; returns the loss trajectories."""
    code = f"""
import json
import numpy as np
import jax, jax.numpy as jnp
from tpusr.engine.gan import GANTrainConfig, create_gan_state
from tpusr.engine.gan_epochs import gan_train_epochs
config = GANTrainConfig(factor=8, dtype="bfloat16", d_params="{d_params}")
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
    "d_params": "{d_params}",
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
    ap.add_argument("--skip_throughput", action="store_true")
    args = ap.parse_args()

    if not args.skip_throughput:
        # interleave f32/bf16 to exclude tunnel drift
        for r in range(args.rounds):
            for m in (["f32", "bf16"] if r % 2 == 0 else ["bf16", "f32"]):
                pps = run_worker(m)
                print(f"round {r} d_params={m}: {pps:.1f} patches/s",
                      flush=True)

    if not args.skip_neutrality:
        for m in ("f32", "bf16"):
            rec = neutrality(m)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
