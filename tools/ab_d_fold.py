"""Full-train-step A/B of the folded discriminator dataflow.

Runs bench.py's gan_train worker (reference workload: batch 8, 192² HR
patches, D step + G step inside the on-device epoch scan) in fresh
subprocesses — default flax D vs TPUSR_D_FOLD=1 (models/srgan_folded.py).
Fresh processes per variant because the env gate is read at trace time and
per-process matches production, and because in-process workload ordering
shifts numbers (DESIGN.md "bench workload isolation").

Run on TPU: python tools/ab_d_fold.py [reps]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


VARIANTS = {
    "default": {},
    "dfold": {"TPUSR_D_FOLD": "1"},
    "dfold2": {"TPUSR_D_FOLD": "2"},   # v2: in-kernel seam masks/prologues
    "gfold": {"TPUSR_G_FOLD": "1"},
    "gfold2": {"TPUSR_G_FOLD": "2"},   # chained intra-block prologues
    "both": {"TPUSR_D_FOLD": "2", "TPUSR_G_FOLD": "2"},
}


def run(extra_env: dict) -> str:
    env = dict(os.environ)
    env.pop("TPUSR_D_FOLD", None)
    env.pop("TPUSR_G_FOLD", None)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--worker", "gan_train", "--iters", "0"],
        capture_output=True, text=True, timeout=3000, env=env)
    out = proc.stdout.strip().splitlines()
    return out[-1] if out else f"no output (rc={proc.returncode}): " + \
        (proc.stderr.strip().splitlines() or ["?"])[-1][-300:]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for i in range(reps):
        for name, env in VARIANTS.items():
            print(f"[{i}] {name:8s}: {run(env)}", flush=True)


if __name__ == "__main__":
    main()
