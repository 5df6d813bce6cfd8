"""Profile the DIP step: trace a short run, aggregate device op durations."""
import sys
sys.path.insert(0, ".")
import glob
import gzip
import json
import time
import numpy as np
import jax
import jax.numpy as jnp

from tpusr.engine.dip import DIPConfig, dip_superresolve


def sync(x):
    return float(jnp.sum(x))


config = DIPConfig(factor=8, num_iter=60, log_freq=60, dtype="bfloat16")
rng = np.random.default_rng(0)
hr = jnp.asarray(rng.random((1, 512, 512, 3)), jnp.float32)
lr = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)

resolved, _ = dip_superresolve(lr, hr, jax.random.key(0), config)
sync(resolved)
t0 = time.perf_counter()
resolved, _ = dip_superresolve(lr, hr, jax.random.key(1), config)
sync(resolved)
print(f"60 iters: {(time.perf_counter()-t0):.3f}s -> "
      f"{(time.perf_counter()-t0)/60*1e3:.2f} ms/iter", flush=True)

with jax.profiler.trace("/tmp/dip_trace3"):
    resolved, _ = dip_superresolve(lr, hr, jax.random.key(2), config)
    sync(resolved)

fn = sorted(glob.glob("/tmp/dip_trace3/**/*.trace.json.gz", recursive=True))[-1]
print("trace:", fn, flush=True)
with gzip.open(fn) as f:
    data = json.load(f)
ev = data.get("traceEvents", [])
# device-side complete events: pid/tid of TPU op track; aggregate by name
agg = {}
total = 0.0
for e in ev:
    if e.get("ph") != "X":
        continue
    name = e.get("name", "")
    dur = e.get("dur", 0) / 1e3  # ms
    cat = e.get("args", {}).get("device_type", "")
    tid_name = str(e.get("pid", "")) + "/" + str(e.get("tid", ""))
    agg.setdefault(name, [0.0, 0, tid_name])
    agg[name][0] += dur
    agg[name][1] += 1
# print top 40 by total duration
top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
for name, (dur, cnt, tid) in top:
    print(f"{dur:9.2f} ms  x{cnt:<5d} {tid:12s} {name[:110]}", flush=True)
