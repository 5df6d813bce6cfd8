"""Full-step A/B of the wide-conv tapsum route (TPUSR_CONV_TAPSUM) on the
GAN train bench (reference workload train_GAN.py:38-71,169,270).

The per-shape screen (tools/ab_conv_pack.py, docs/evidence_r5/
ab_conv_pack.log) shows XLA's batched conv 35-60% below the GEMM roofline
at the D's wide stride-1 3x3 shapes, with the 9-shifted-GEMM tapsum form
on it. Screens have lied before (the round-3 folding family won every
per-shape screen and lost every full-step A/B — DESIGN.md); this tool runs
the decisive full-step measurement: bench.py's gan_train worker in a fresh
subprocess per variant, interleaved to exclude tunnel drift.

Usage: python tools/ab_conv_tapsum.py [--rounds 2]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# variant name -> env overrides (both routes carry disjoint shape gates, so
# "both" routes tapsum at 128->256 and im2col at 64->128 / 256->512)
VARIANTS = {
    "off": {"TPUSR_CONV_TAPSUM": "0", "TPUSR_CONV_IM2COL": "0"},
    "tapsum": {"TPUSR_CONV_TAPSUM": "1", "TPUSR_CONV_IM2COL": "0"},
    "im2col": {"TPUSR_CONV_TAPSUM": "0", "TPUSR_CONV_IM2COL": "1"},
    "both": {"TPUSR_CONV_TAPSUM": "1", "TPUSR_CONV_IM2COL": "1"},
}


def run_worker(variant: str) -> float:
    env = dict(os.environ)
    env.update(VARIANTS[variant])
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--variants", default="off,tapsum",
                    help=f"comma list from {sorted(VARIANTS)}")
    args = ap.parse_args()
    names = args.variants.split(",")

    for r in range(args.rounds):
        for m in (names if r % 2 == 0 else names[::-1]):
            pps = run_worker(m)
            print(f"round {r} conv_wide={m}: {pps:.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
