"""Decompose the RRDB 2K x4 frame: full net vs nb=0 (head + upsample chain +
conv_hr/conv_last only) — the difference is the 69 line-buffer dense-block
kernels. Cheaper than a device trace over the tunnel."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.rrdb import RRDBNet


def sync(x):
    return float(jnp.sum(x))


def bench(net, lr, reps=5):
    v = net.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    fwd = jax.jit(lambda x: net.apply(v, x))
    out = fwd(lr)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(lr)
    sync(out)
    return (time.perf_counter() - t0) / reps, out


rng = np.random.default_rng(0)
lr = jnp.asarray(rng.random((1, 270, 480, 3)), jnp.float32)

t_rest, out = bench(RRDBNet(scale=4, dtype="bfloat16", nb=0), lr)
print(f"nb=0 (head+up+hr): {t_rest*1e3:6.1f} ms", flush=True)

t_full, out = bench(RRDBNet(scale=4, dtype="bfloat16"), lr)
mpix = out.shape[1] * out.shape[2] / 1e6
print(f"nb=23 full:        {t_full*1e3:6.1f} ms -> {mpix/t_full:.2f} MPix/s",
      flush=True)
print(f"dense blocks (69): {(t_full-t_rest)*1e3:6.1f} ms "
      f"({(t_full-t_rest)/69*1e3:.3f} ms/block)", flush=True)
