"""Attribute the RRDB in-process throughput swing (VERDICT r3 weak #6).

Observation (DESIGN.md "bench workload isolation"): rrdb 2K reads ~20.0
MPix/s in a clean process but ~18.6 after ANY other workload ran first in
the same process. Candidate causes: HBM allocator state / live-buffer
fragmentation, tunnel-side executable cache, host dispatch state.

Scenarios (each a fresh subprocess; all share the persistent compile cache):

  iso          rrdb alone                         — expected ~20.0
  after        gan_eval -> rrdb                   — expected ~18.6
  after_clean  gan_eval -> delete all live arrays + gc + jax.clear_caches
               -> rrdb.  If this restores ~20.0 the cause is live-buffer /
               allocator state; if not, it is tunnel- or executable-side.
  sandwich     rrdb -> gan_eval -> rrdb           — does the SAME program
               re-measured in-process degrade? isolates ordering from
               program identity.

Usage: python tools/attr_rrdb_swing.py
"""
import json
import os
import subprocess
import sys

SCEN_CODE = {
    "iso": """
import bench
print("RRDB", bench.bench_rrdb_2k())
""",
    "after": """
import bench
print("GAN_EVAL", bench.bench_gan_eval_mpix())
print("RRDB", bench.bench_rrdb_2k())
""",
    "after_clean": """
import bench, gc, jax
print("GAN_EVAL", bench.bench_gan_eval_mpix())
for a in list(jax.live_arrays()):
    a.delete()
gc.collect()
jax.clear_caches()
print("RRDB", bench.bench_rrdb_2k())
""",
    "sandwich": """
import bench
print("RRDB_FIRST", bench.bench_rrdb_2k())
print("GAN_EVAL", bench.bench_gan_eval_mpix())
print("RRDB_SECOND", bench.bench_rrdb_2k())
""",
}


def run(name: str) -> dict:
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    proc = subprocess.run([sys.executable, "-c", SCEN_CODE[name]],
                          capture_output=True, text=True, timeout=1800,
                          env=env, cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    vals = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if len(parts) == 2:
            try:
                vals[parts[0]] = round(float(parts[1]), 2)
            except ValueError:
                pass
    if not vals:
        vals["error"] = proc.stderr[-300:]
    return vals


def main():
    out = {}
    for name in SCEN_CODE:
        out[name] = run(name)
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
