"""A/B the generator auto-fuse route (TPUSR_G_FUSE) on the x8 eval bench.

Runs bench.py's gan_eval worker (full-image batch-1 G forward) in fresh
subprocesses — default banded-XLA convs vs the fused Pallas kernel route.
Also reruns gan_train with the flag to confirm the training path is
unaffected (batched convs fall through the n==1 gate).

Run on TPU: python tools/ab_g_fuse.py [reps]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(worker: str, fuse) -> str:
    env = dict(os.environ)
    env.pop("TPUSR_G_FUSE", None)
    if fuse:
        env["TPUSR_G_FUSE"] = fuse if isinstance(fuse, str) else "1"
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
        print(f"[{i}] eval default: {run('gan_eval', False)}", flush=True)
        print(f"[{i}] eval fused:   {run('gan_eval', True)}", flush=True)
        print(f"[{i}] eval chained: {run('gan_eval', '2')}", flush=True)
    print(f"train default: {run('gan_train', False)}", flush=True)
    print(f"train fused:   {run('gan_train', True)}", flush=True)


if __name__ == "__main__":
    main()
