"""A/B the zero-seam batch fold (ops/batch_fold.py) on the GAN-D conv shapes.

Routes per shape: plain XLA batched conv vs folded batch-1 XLA conv vs (where
fused_conv_supported admits it) the folded batch-1 Pallas kernel. Times
fwd and fwd+bwd per dispatch. Decides whether the round-4 batched conv
family is worth building (DESIGN.md "Round-4 ammunition").

Run on TPU: python tools/ab_fold_conv.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.layers import conv_apply
from tpusr.ops.batch_fold import (fold_grid, fold_rows, fold_seam,
                                  folded_conv_apply, folded_conv_grid,
                                  folded_conv_s2_grid_pallas,
                                  folded_conv_s2_pallas,
                                  unfold_grid, unfold_rows)
from tpusr.ops.pallas_conv import fused_conv3x3, fused_conv_supported

# (label, B,H,W,Cin, Cout, stride, grid, s2pack) — the D schedule at 192²
# patches plus a G-body shape; grid=(gh,gw,sh,sw) adds a 2-D grid-fold
# variant (clears the Pallas W>=64 constraint for small-spatial layers);
# s2pack adds the space-to-depth 4-tap Pallas route for stride-2 layers:
# "rows:SEAM" (row fold) or "grid:gh,gw,sh,sw" (grid fold).
SHAPES = [
    ("b0 64->64 s2 @192", 8, 192, 192, 64, 64, 2, None, "rows:4"),
    ("b1 64->128 s1 @96", 8, 96, 96, 64, 128, 1, None, None),
    ("b2 128->128 s2 @96", 8, 96, 96, 128, 128, 2, None, "grid:2,4,8,8"),
    ("b3 128->256 s1 @48", 8, 48, 48, 128, 256, 1, (4, 2, 8, 8), None),
    ("b4 256->256 s2 @48", 8, 48, 48, 256, 256, 2, None, "grid:4,2,16,16"),
    ("b5 256->512 s1 @24", 8, 24, 24, 256, 512, 1, (2, 4, 8, 8), None),
    ("b6 512->512 s2 @24", 8, 24, 24, 512, 512, 2, None, "grid:2,4,8,8"),
    ("Gbody 64->64 s1 @24", 8, 24, 24, 64, 64, 1, (2, 4, 8, 8), None),
]


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    sync(out if isinstance(out, jnp.ndarray) else out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out if isinstance(out, jnp.ndarray) else out[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    for label, b, h, w, ci, co, st, grid, s2pack in SHAPES:
        x = jnp.asarray(rng.normal(size=(b, h, w, ci)), jnp.bfloat16)
        kern = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.05,
                           jnp.bfloat16)

        plain = jax.jit(lambda x, k: conv_apply(x, k, st, "zero"))
        folded = jax.jit(lambda x, k: folded_conv_apply(x, k, st, "zero"))

        def g(f):
            return jax.jit(jax.grad(
                lambda x, k: jnp.sum(f(x, k).astype(jnp.float32)),
                argnums=(0, 1)))

        t_p, t_f = timeit(plain, x, kern), timeit(folded, x, kern)
        gp, gf = g(plain), g(folded)
        t_pg, t_fg = timeit(gp, x, kern), timeit(gf, x, kern)
        line = (f"{label}: fwd plain {t_p:6.3f} fold {t_f:6.3f} | "
                f"bwd plain {t_pg:6.3f} fold {t_fg:6.3f}")

        s = fold_seam(3, st)
        fshape = (1, b * (h + s), w, ci)
        if st == 1 and fused_conv_supported(fshape, 3, 1):
            fused = jax.jit(lambda x, k: unfold_rows(
                fused_conv3x3(fold_rows(x, s), k, pad_mode="zero"),
                b, h, 1))
            t_k = timeit(fused, x, kern)
            gk = g(fused)
            t_kg = timeit(gk, x, kern)
            line += f" | pallas fwd {t_k:6.3f} bwd {t_kg:6.3f}"

        if grid is not None:
            gh, gw, sh, sw = grid
            gridded = jax.jit(lambda x, k: folded_conv_grid(
                x, k, st, "zero", gh, gw, seam_h=sh, seam_w=sw))
            t_g = timeit(gridded, x, kern)
            t_gg = timeit(g(gridded), x, kern)
            line += f" | gridxla fwd {t_g:6.3f} bwd {t_gg:6.3f}"
            gshape = (1, gh * (h + sh), gw * (w + sw), ci)
            if st == 1 and fused_conv_supported(gshape, 3, 1):
                gfused = jax.jit(lambda x, k: unfold_grid(
                    fused_conv3x3(fold_grid(x, gh, gw, sh, sw), k,
                                  pad_mode="zero"), gh, gw, h, w))
                t_gk = timeit(gfused, x, kern)
                t_gkg = timeit(g(gfused), x, kern)
                line += f" | gridpallas fwd {t_gk:6.3f} bwd {t_gkg:6.3f}"

        if s2pack is not None:
            kind, spec = s2pack.split(":")
            if kind == "rows":
                seam = int(spec)
                s2f = jax.jit(lambda x, k: folded_conv_s2_pallas(
                    x, k, seam=seam))
            else:
                gh, gw, sh, sw = (int(v) for v in spec.split(","))
                s2f = jax.jit(lambda x, k: folded_conv_s2_grid_pallas(
                    x, k, gh, gw, seam_h=sh, seam_w=sw))
            try:
                t_s = timeit(s2f, x, kern)
                t_sg = timeit(g(s2f), x, kern)
                line += f" | s2pack fwd {t_s:6.3f} bwd {t_sg:6.3f}"
            except Exception as e:  # Mosaic lowering can fail per-shape
                line += f" | s2pack FAILED ({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
