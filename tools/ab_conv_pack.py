"""Per-shape screen: can any K/N-packed GEMM form beat XLA's batched conv
at the GAN-step hot conv shapes? (VERDICT r4 #4: "K=27 stem / N=64 bodies
run <50% MXU structurally".)

Variants per shape (all mathematically identical, zero-pad SAME k3):
  conv     — lax.conv_general_dilated (what conv_apply routes today)
  im2col   — explicit patch extraction + ONE GEMM (K = 9*Cin); packs all
             taps into the contraction dim (the only valid packing axis for
             a single conv chain: N-packing across taps needs a shared LHS,
             which different tap shifts don't give, and M is already large)
  tapsum   — 9 shifted GEMMs (K = Cin each) summed; isolates whether XLA's
             conv lowering already fuses the tap loop optimally
  gemm_ref — a plain GEMM with the SAME (M, K, N) as im2col: the roofline
             this conv could reach if patch extraction were free

Screening only: per-dispatch timings over the tunnel carry ~1 ms noise and
miss XLA's cross-op fusion — a winner here must still win a FULL-STEP A/B
before routing (the round-3 folding family won several per-shape screens
and lost every full-step A/B; DESIGN.md "the folding family verdict").

Usage: python tools/ab_conv_pack.py [--reps 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


# (name, (B, H, W, Cin), Cout, stride) — the GAN step's conv population
# (train_GAN.py:38-71 workload; D runs concat(real,fake) so B=16)
SHAPES = [
    ("G_body   ", (8, 24, 24, 64), 64, 1),
    ("D_b1     ", (16, 96, 96, 64), 128, 1),
    ("D_b3     ", (16, 48, 48, 128), 256, 1),
    ("D_b5     ", (16, 24, 24, 256), 512, 1),
    ("D_stem   ", (16, 192, 192, 3), 64, 1),
]


def make_variants(x, w):
    b, h, wd, cin = x.shape
    k, _, _, cout = w.shape  # HWIO (3,3,cin,cout)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + h, dx:dx + wd, :]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)          # (B,H,W,9*Cin)
        y = patches.reshape(-1, 9 * cin) @ w.reshape(9 * cin, cout)
        return y.reshape(b, h, wd, cout)

    def tapsum(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros((b * h * wd, cout), x.dtype)
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy:dy + h, dx:dx + wd, :].reshape(-1, cin)
                y = y + xs @ w[dy, dx]
        return y.reshape(b, h, wd, cout)

    m = b * h * wd
    lhs = jnp.zeros((m, 9 * cin), x.dtype)
    rhs = jnp.zeros((9 * cin, cout), x.dtype)

    def gemm_ref(lhs, rhs):
        return lhs @ rhs

    return {
        "conv": (jax.jit(conv), (x, w)),
        "im2col": (jax.jit(im2col), (x, w)),
        "tapsum": (jax.jit(tapsum), (x, w)),
        "gemm_ref": (jax.jit(gemm_ref), (lhs, rhs)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    for name, shape, cout, stride in SHAPES:
        b, h, wd, cin = shape
        x = jnp.asarray(rng.standard_normal(shape), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dt)
        variants = make_variants(x, w)
        ref = None
        flops = 2 * b * h * wd * 9 * cin * cout
        row = [f"{name} {shape}x{cout}:"]
        for vname, (fn, fargs) in variants.items():
            y = fn(*fargs)
            sync(y)
            if vname == "conv":
                ref = np.asarray(y, np.float32)
            elif vname != "gemm_ref":
                got = np.asarray(y, np.float32)
                if not np.allclose(got, ref, atol=0.15, rtol=0.05):
                    row.append(f"{vname}=MISMATCH")
                    continue
            t0 = time.perf_counter()
            for _ in range(args.reps):
                y = fn(*fargs)
            sync(y)
            per = (time.perf_counter() - t0) / args.reps
            row.append(f"{vname}={per*1e3:.3f}ms({flops/per/1e12:.1f}TF/s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
