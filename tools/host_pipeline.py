import sys
sys.path.insert(0, ".")
"""VERDICT #10: stack_dataset_for_device economics at real-DIV2K scale.

Synthetic in-memory dataset at DIV2K dims (HR ~1020x678 after the mandatory
/2, mixed sizes), N=100 measured, extrapolated to 800. Measures: host stack
build time, padded bytes + padding waste, and host->device upload time over
the tunnel.
"""
import time
import numpy as np


class SynthDS:
    def __init__(self, n, seed=0):
        rng = np.random.default_rng(seed)
        # DIV2K-after-/2 HR dims: long side ~1020, short side 300-1020
        self.dims = []
        for _ in range(n):
            lw = int(rng.integers(80, 128))   # LR x8 width
            lh = int(rng.integers(40, 85))    # LR x8 height
            self.dims.append((lh, lw))
        self.rng = rng

    def __len__(self):
        return len(self.dims)

    def base_pair(self, i):
        lh, lw = self.dims[i]
        lr = self.rng.random((lh, lw, 3)).astype(np.float32)
        hr = self.rng.random((lh * 8, lw * 8, 3)).astype(np.float32)
        return lr, hr, f"{i:04d}"


from tpusr.engine.gan_epochs import stack_dataset_for_device

N = 100
ds = SynthDS(N)


class Cached:
    """Pre-generate the float pairs so the measurement isolates the
    pad/stack/quantize cost from the synthetic 'decode'."""

    def __init__(self, ds):
        t0 = time.perf_counter()
        self.items = [ds.base_pair(i) for i in range(len(ds))]
        print(f"synthetic decode stand-in: {time.perf_counter()-t0:.1f}s "
              f"(real pipeline: native libpng ~67ms/2K image)", flush=True)

    def __len__(self):
        return len(self.items)

    def base_pair(self, i):
        return self.items[i]


cds = Cached(ds)
t0 = time.perf_counter()
lr_u8, hr_u8, valid = stack_dataset_for_device(cds, 8)
t_build = time.perf_counter() - t0
pad_bytes = lr_u8.nbytes + hr_u8.nbytes
true_bytes = sum(lh * lw * 3 * (1 + 64) for lh, lw in ds.dims)
print(f"N={N}: build {t_build:.1f}s, padded {pad_bytes/2**20:.0f} MiB, "
      f"true {true_bytes/2**20:.0f} MiB, waste {pad_bytes/true_bytes:.2f}x",
      flush=True)

import os
if os.environ.get("TPUSR_HOST_ONLY"):
    print("upload skipped (TPUSR_HOST_ONLY)", flush=True)
    raise SystemExit(0)
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
lr_d = jnp.asarray(lr_u8)
hr_d = jnp.asarray(hr_u8)
s = float(jnp.sum(lr_d.astype(jnp.float32))) + float(
    jnp.sum(hr_d.astype(jnp.float32)))
t_up = time.perf_counter() - t0
print(f"upload+materialize: {t_up:.1f}s -> "
      f"{pad_bytes/2**20/t_up:.1f} MiB/s", flush=True)
print(f"EXTRAPOLATED 800 imgs: build {t_build*8:.0f}s, "
      f"padded {pad_bytes*8/2**30:.2f} GiB, upload {t_up*8:.0f}s", flush=True)
