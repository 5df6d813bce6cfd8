"""RRDB (ESRGAN-scale) generator — BASELINE.json config 5.

The reference repo ships only the SRGAN topology; the benchmark config list
("ESRGAN-scale RRDB generator x4 producing 2K outputs on a v5p slice")
calls for the larger residual-in-residual dense-block generator of ESRGAN
(Wang et al. 2018). Standard topology, NHWC/TPU-first:

  conv_first -> nb x RRDB (3 dense blocks each: 5 convs, growth gc,
  residual scaling 0.2) -> trunk conv + long skip -> [nearest x2 + conv +
  lrelu] per octave -> conv_hr -> conv_last

At the canonical nf=64, nb=23, gc=32, x4 size this is 16,697,987 params.
Full-resolution 2K outputs ride the spatial tiling / halo-sharding paths in
tpusr/parallel/spatial.py (the model is fully convolutional).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from tpusr.models.layers import (
    Conv,
    conv_apply,
    fusion_mode,
    leaky_relu,
    torch_bias_init_for,
    torch_kernel_init,
)


def _conv3(x, kernel, mode: str = "auto"):
    """Dense-block 3x3 zero-SAME conv: Pallas tap-grouped kernel on TPU
    (small Cin packs 128//Cin taps per MXU pass — ops/pallas_conv.py),
    conv_apply elsewhere. mode: resolved fusion mode ('auto' defers to the
    import-time TPUSR_CONV_FUSION default — layers.fusion_mode)."""
    from tpusr.ops.pallas_conv import (
        fused_conv3x3,
        fused_conv_available,
        fused_conv_supported,
    )

    mode = fusion_mode(mode)
    if mode != "off":
        interp = mode == "interpret"
        if ((interp or fused_conv_available())
                and fused_conv_supported(x.shape, 3, 1, allow_hpad=True)):
            return fused_conv3x3(x, kernel, pad_mode="zero",
                                 interpret=interp)
    return conv_apply(x, kernel, 1, "zero")


class DenseBlock(nn.Module):
    """5-conv dense block with growth gc and 0.2 residual scaling.

    Parameters are the canonical per-conv kernels conv_k: (3,3,nf+(k-1)gc,gc)
    (ESRGAN layout, torch-init distributions preserved per logical conv).

    ``packed=True`` (default) evaluates the block MXU-packed: gc=32 output
    channels fill a quarter of the 128-wide MXU output tile and every
    ``concat([x, c1..])`` materializes an unaligned-lane tensor in HBM
    (round-1 bench: 7.8 MPix/s with most convs at 25% output packing).
    Since conv(concat(xs), K) == sum_i conv(xs_i, K_slice_i), the packed
    path regroups kernel slices BY PRODUCER: one conv per source tensor
    emitting all of its consumers' contributions at once —
    x -> (4gc+nf)-wide, c1 -> (3gc+nf), c2 -> (2gc+nf), c3 -> (gc+nf),
    c4 -> nf — then assembles c_k by slice-adds (one fused VPU pass each).
    No concats, all conv outputs >= nf channels. Identical math
    (fp-reassociation only; golden-tested against packed=False).
    """

    nf: int = 64
    gc: int = 32
    dtype: Any = None
    packed: bool = True
    # line=True: x arrives as the lane/row-padded trunk tensor
    # (1, HB, W, 128) and the whole block runs as ONE line-buffered Pallas
    # kernel (ops/pallas_dense.py) — read x once, write x+0.2*c5 once, all
    # nine intermediates in VMEM. Set by RRDBNet when the shape qualifies.
    line: bool = False
    line_h: int = 0          # logical image rows (<= padded HB)
    line_interpret: bool = False
    fusion: str = "auto"     # 'auto' | 'off' | 'interpret' (layers.fusion_mode)

    @nn.compact
    def __call__(self, x):
        nf, gc = self.nf, self.gc
        kshapes = [nf + i * gc for i in range(5)]
        kernels, biases = [], []
        for k, cin in enumerate(kshapes, start=1):
            cout = gc if k < 5 else nf
            kernels.append(self.param(f"conv{k}_kernel", torch_kernel_init,
                                      (3, 3, cin, cout)))
            biases.append(self.param(f"conv{k}_bias",
                                     torch_bias_init_for(9 * cin), (cout,)))
        if self.line:
            from tpusr.ops.pallas_dense import dense_block_line

            return dense_block_line(x, kernels, biases, self.line_h,
                                    interpret=self.line_interpret)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        kernels = [k.astype(x.dtype) for k in kernels]
        b1, b2, b3, b4, b5 = [b.astype(x.dtype) for b in biases]
        k1, k2, k3, k4, k5 = kernels

        fm = self.fusion
        if not self.packed:
            c1 = leaky_relu(_conv3(x, k1, fm) + b1, 0.2)
            c2 = leaky_relu(_conv3(jnp.concatenate([x, c1], -1), k2, fm) + b2, 0.2)
            c3 = leaky_relu(_conv3(jnp.concatenate([x, c1, c2], -1), k3, fm) + b3, 0.2)
            c4 = leaky_relu(_conv3(jnp.concatenate([x, c1, c2, c3], -1), k4, fm) + b4, 0.2)
            c5 = _conv3(jnp.concatenate([x, c1, c2, c3, c4], -1), k5, fm) + b5
            return x + 0.2 * c5

        # producer-packed kernels: W_src = concat of every consumer's slice
        # of the source's input channels
        def sl(k, lo):  # source channel slice [lo, lo+width) of kernel k
            return k[:, :, lo:lo + (nf if lo == 0 else gc), :]

        w_x = jnp.concatenate([sl(k1, 0), sl(k2, 0), sl(k3, 0), sl(k4, 0),
                               sl(k5, 0)], axis=-1)            # nf -> 4gc+nf
        w_1 = jnp.concatenate([sl(k2, nf), sl(k3, nf), sl(k4, nf),
                               sl(k5, nf)], axis=-1)           # gc -> 3gc+nf
        w_2 = jnp.concatenate([sl(k3, nf + gc), sl(k4, nf + gc),
                               sl(k5, nf + gc)], axis=-1)      # gc -> 2gc+nf
        w_3 = jnp.concatenate([sl(k4, nf + 2 * gc),
                               sl(k5, nf + 2 * gc)], axis=-1)  # gc -> gc+nf
        w_4 = sl(k5, nf + 3 * gc)                              # gc -> nf

        px = _conv3(x, w_x, fm)
        c1 = leaky_relu(px[..., :gc] + b1, 0.2)
        p1 = _conv3(c1, w_1, fm)
        c2 = leaky_relu(px[..., gc:2 * gc] + p1[..., :gc] + b2, 0.2)
        p2 = _conv3(c2, w_2, fm)
        c3 = leaky_relu(px[..., 2 * gc:3 * gc] + p1[..., gc:2 * gc]
                        + p2[..., :gc] + b3, 0.2)
        p3 = _conv3(c3, w_3, fm)
        c4 = leaky_relu(px[..., 3 * gc:4 * gc] + p1[..., 2 * gc:3 * gc]
                        + p2[..., gc:2 * gc] + p3[..., :gc] + b4, 0.2)
        p4 = _conv3(c4, w_4, fm)
        c5 = (px[..., 4 * gc:] + p1[..., 3 * gc:] + p2[..., 2 * gc:]
              + p3[..., gc:] + p4 + b5)
        return x + 0.2 * c5


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = None
    packed: bool = True
    line: bool = False
    line_h: int = 0
    line_interpret: bool = False
    fusion: str = "auto"

    @nn.compact
    def __call__(self, x):
        kw = dict(line=self.line, line_h=self.line_h,
                  line_interpret=self.line_interpret, fusion=self.fusion)
        out = DenseBlock(self.nf, self.gc, self.dtype, self.packed,
                         name="rdb1", **kw)(x)
        out = DenseBlock(self.nf, self.gc, self.dtype, self.packed,
                         name="rdb2", **kw)(out)
        out = DenseBlock(self.nf, self.gc, self.dtype, self.packed,
                         name="rdb3", **kw)(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    """ESRGAN generator. Output is unbounded (no tanh), input [0,1].

    ``dtype='bfloat16'`` computes activations in bf16 (params f32, output f32).
    """

    out_channels: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4  # power of two
    dtype: Any = None
    packed: bool = True  # MXU-packed dense blocks (see DenseBlock)
    fusion: str = "auto"  # 'auto' | 'off' | 'interpret' (layers.fusion_mode)
    # NOTE: a low-res phase decomposition of [nearest-2x + conv3x3] (4 phase
    # convs at LR, 2.25x fewer MACs) was built and measured SLOWER on the 2K
    # bench (11.3 vs 12.1 MPix/s: phase-interleave stacks cost more HR-size
    # passes than the saved upsample+conv) — removed; record in DESIGN.md.

    @nn.compact
    def __call__(self, x):
        assert self.scale & (self.scale - 1) == 0, "scale must be power of 2"
        if self.dtype is not None:
            x = x.astype(self.dtype)
        fea = Conv(self.nf, 3, dtype=self.dtype, name="conv_first")(x)
        trunk = fea

        from tpusr.ops.pallas_dense import (
            dense_line_available,
            dense_line_supported,
        )

        mode = fusion_mode(self.fusion)
        interp = mode == "interpret"
        H, W = trunk.shape[1], trunk.shape[2]
        HB = max(-(-H // 8) * 8, 16)
        use_line = (mode != "off" and self.packed
                    and self.nf == 64 and self.gc == 32
                    and (interp or dense_line_available())
                    and dense_line_supported((1, HB, W, 128), H))
        if use_line:
            # whole trunk on a lane/row-padded buffer: ONE pad here, 69
            # line-buffered block kernels chained in HBM, one slice below
            trunk = jnp.pad(trunk, ((0, 0), (0, HB - H), (0, 0),
                                    (0, 128 - self.nf)))
            for i in range(self.nb):
                trunk = RRDB(self.nf, self.gc, self.dtype, self.packed,
                             line=True, line_h=H, line_interpret=interp,
                             fusion=mode, name=f"rrdb{i}")(trunk)
            trunk = trunk[:, :H, :, :self.nf]
        else:
            for i in range(self.nb):
                trunk = RRDB(self.nf, self.gc, self.dtype, self.packed,
                             fusion=mode, name=f"rrdb{i}")(trunk)
        trunk = Conv(self.nf, 3, dtype=self.dtype, auto_fuse=True,
                     fusion=mode, name="trunk_conv")(trunk)
        fea = fea + trunk

        n_up = self.scale.bit_length() - 1
        for i in range(n_up):
            n, h, w, c = fea.shape
            # one broadcast+reshape, not two chained repeats (saves a
            # full HR-tensor materialization per octave)
            fea = jnp.broadcast_to(
                fea[:, :, None, :, None, :],
                (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)
            fea = leaky_relu(
                Conv(self.nf, 3, dtype=self.dtype, auto_fuse=True,
                     fusion=mode, name=f"upconv{i + 1}")(fea), 0.2)
        fea = leaky_relu(Conv(self.nf, 3, dtype=self.dtype, auto_fuse=True,
                          fusion=mode, name="conv_hr")(fea), 0.2)
        out = Conv(self.out_channels, 3, dtype=self.dtype, name="conv_last")(fea)
        return out.astype(jnp.float32)
