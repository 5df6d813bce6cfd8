"""A/B bench for the wgrad kernel on the up0 DIP shape (1,512,512,128)->128.

Current kernel: 9 taps of dot_general contracting the TH*W dim of BOTH
operands (non-canonical orientation -> Mosaic inserts per-chunk relayouts;
measured 0.71 ms vs the fwd kernel's 0.42 at equal FLOPs).

Variant T: transpose the G block ONCE per program (relayout TH*W*Cout), then
9 canonical (Cout,K)@(K,Cin) dots; dw emitted transposed and fixed outside.
"""
import sys
sys.path.insert(0, ".")
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusr.ops.pallas_conv import _pick_tile_h, _wgrad_pallas


def sync(x):
    return float(jnp.sum(x))


def _wgrad_kernel_t(x_hbm, g_ref, es_ref, eb_ref, dw_ref, win, sem, *,
                    TH, H, W, Cin, reflect, affine, act):
    i = pl.program_id(0)
    nprog = H // TH

    def _copy(src_rows, dst_rows):
        dma = pltpu.make_async_copy(x_hbm.at[0, src_rows],
                                    win.at[dst_rows], sem)
        dma.start()
        dma.wait()

    if nprog == 1:
        _copy(pl.ds(0, TH), pl.ds(1, TH))
        if reflect:
            win[0] = win[2]
            win[TH + 1] = win[TH - 1]
    else:
        @pl.when(i == 0)
        def _():
            _copy(pl.ds(0, TH + 1), pl.ds(1, TH + 1))
            if reflect:
                win[0] = win[2]

        @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
        def _():
            _copy(pl.ds(i * TH - 1, TH + 2), pl.ds(0, TH + 2))

        @pl.when(i == nprog - 1)
        def _():
            _copy(pl.ds(H - TH - 1, TH + 1), pl.ds(0, TH + 1))
            if reflect:
                win[TH + 1] = win[TH - 1]

    if affine or act:
        a0 = win[:]
        if affine:
            a0 = a0 * es_ref[:].astype(a0.dtype) + eb_ref[:].astype(a0.dtype)
        if act == "leaky_relu":
            zero = jnp.zeros((), a0.dtype)
            a0 = (jnp.maximum(a0, zero)
                  + jnp.asarray(0.2, a0.dtype) * jnp.minimum(a0, zero))
        win[:] = a0

    if not reflect:
        if nprog == 1:
            win[0] = jnp.zeros_like(win[0])
            win[TH + 1] = jnp.zeros_like(win[TH + 1])
        else:
            @pl.when(i == 0)
            def _():
                win[0] = jnp.zeros_like(win[0])

            @pl.when(i == nprog - 1)
            def _():
                win[TH + 1] = jnp.zeros_like(win[TH + 1])

    am = win[:]
    if reflect:
        lcol = am[:, 1:2]
        rcol = am[:, W - 2:W - 1]
    else:
        lcol = jnp.zeros_like(am[:, 0:1])
        rcol = lcol
    al = jnp.concatenate([lcol, am[:, :W - 1]], axis=1)
    ar = jnp.concatenate([am[:, 1:], rcol], axis=1)

    # ONE relayout: G block (TH*W, Cout) -> (Cout, TH*W)
    g2t = g_ref[0].reshape(TH * W, g_ref.shape[-1]).T
    dn = (((1,), (0,)), ((), ()))  # canonical (M,K)@(K,N)
    for t in range(9):
        dy, src = t // 3, (al, am, ar)[t % 3]
        patch = src[dy:dy + TH].reshape(TH * W, Cin)
        part = jax.lax.dot_general(g2t, patch, dn,
                                   preferred_element_type=jnp.float32)
        if nprog == 1:
            dw_ref[t] = part
        else:
            @pl.when(i == 0)
            def _(part=part, t=t):
                dw_ref[t] = part

            @pl.when(i > 0)
            def _(part=part, t=t):
                dw_ref[t] = dw_ref[t] + part


def wgrad_t(x, g, es, eb, *, affine, act, reflect, TH=None):
    _, H, W, Cin = x.shape
    Cout = g.shape[-1]
    if TH is None:
        TH = _pick_tile_h(H, W, Cin, Cout, x.dtype.itemsize)
    n = H // TH
    kern = functools.partial(
        _wgrad_kernel_t, TH=TH, H=H, W=W, Cin=Cin,
        reflect=reflect, affine=affine, act=act)
    dw9 = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TH, W, Cout), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((9, Cout, Cin), jnp.float32),
        out_specs=pl.BlockSpec((9, Cout, Cin), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, Cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x, g, es, eb)
    return dw9.transpose(0, 2, 1).reshape(3, 3, Cin, Cout)


def main():
    H = W = 512
    Cin = Cout = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, Cin)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((1, H, W, Cout)), jnp.bfloat16)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (Cin,)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((Cin,)) * 0.1, jnp.float32)

    cur = jax.jit(lambda x, g: _wgrad_pallas(
        x, g, es, eb, affine=True, act="leaky_relu", reflect=True,
        interpret=False))
    var = jax.jit(lambda x, g: wgrad_t(
        x, g, es, eb, affine=True, act="leaky_relu", reflect=True))

    a = cur(x, g)
    b = var(x, g)
    err = float(jnp.abs(a - b).max())
    print(f"max |cur - varT| = {err:.3e}", flush=True)

    for name, fn in [("current", cur), ("varT", var)]:
        sync(fn(x, g))
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn(x, g)
        sync(out)
        dt = (time.perf_counter() - t0) / 30
        gf = 2 * 9 * Cin * Cout * H * W / 1e9
        print(f"{name}: {dt*1e3:.3f} ms  ({gf/dt/1e3:.0f} TF/s)", flush=True)


def main_scan():
    """Same A/B inside one dispatched lax.scan (no per-call dispatch noise)."""
    H = W = 512
    Cin = Cout = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, Cin)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((1, H, W, Cout)), jnp.bfloat16)
    es = jnp.asarray(rng.uniform(0.5, 1.5, (Cin,)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((Cin,)) * 0.1, jnp.float32)

    def make(fn):
        def body(c, i):
            xv = x + (i * 1e-6).astype(x.dtype)
            dw = fn(xv, g, es, eb, affine=True, act="leaky_relu",
                    reflect=True)
            return c + jnp.sum(dw), None
        return jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0), jnp.arange(100))[0])

    cur = make(lambda *a, **k: _wgrad_pallas(*a, interpret=False, **k))
    var = make(wgrad_t)
    var16 = make(lambda *a, **k: wgrad_t(*a, TH=16, **k))
    var32 = make(lambda *a, **k: wgrad_t(*a, TH=32, **k))
    for name, fn in [("current", cur), ("varT", var), ("varT16", var16),
                     ("varT32", var32)]:
        sync(fn())
        t0 = time.perf_counter()
        sync(fn())
        dt = (time.perf_counter() - t0) / 100
        gf = 2 * 9 * Cin * Cout * H * W / 1e9
        print(f"scan {name}: {dt*1e3:.3f} ms ({gf/dt/1e3:.0f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
    main_scan()
