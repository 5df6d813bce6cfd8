"""A/B the generator fused-conv route (TPUSR_G_FUSE) on the GAN benches.

Eval (full-image batch-1 G forward) routes through the fused Pallas kernel
BY DEFAULT (measured 96.7 vs 81.4 MPix/s on the x8 eval bench, 2026-08);
TPUSR_G_FUSE=0 restores the banded-XLA path, TPUSR_G_FUSE=train
additionally fuses the TRAINING generator's qualifying convs (measured
neutral-to-slightly-negative: 374.9 vs ~394 patches/s — off by default).
Fresh subprocess per variant: env gates are read at trace time, and
in-process workload ordering shifts numbers (DESIGN.md "bench workload
isolation").

Run on TPU: python tools/ab_g_fuse.py [reps]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(worker: str, fuse: str | None) -> str:
    env = dict(os.environ)
    env.pop("TPUSR_G_FUSE", None)
    if fuse is not None:
        env["TPUSR_G_FUSE"] = fuse
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--worker", worker, "--iters", "0"],
        capture_output=True, text=True, timeout=3000, env=env)
    out = proc.stdout.strip().splitlines()
    return out[-1] if out else f"no output (rc={proc.returncode}): " + \
        (proc.stderr.strip().splitlines() or ["?"])[-1][-300:]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for i in range(reps):
        print(f"[{i}] eval fused (default): {run('gan_eval', None)}",
              flush=True)
        print(f"[{i}] eval xla (FUSE=0):    {run('gan_eval', '0')}",
              flush=True)
    print(f"train default:      {run('gan_train', None)}", flush=True)
    print(f"train FUSE=train:   {run('gan_train', 'train')}", flush=True)


if __name__ == "__main__":
    main()
