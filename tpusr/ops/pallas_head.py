"""Fused discriminator dense-head backward + Adam — one weight pass.

Reference workload (train_GAN.py:38-53 D update at batch 8, 192² patches):
the SRGAN discriminator's dense1 layer (73728->1024, 75.5M params = 94% of
the D) dominates the D update's HBM traffic. The stock XLA graph streams the
f32 master weight FOUR times after the forward:

    dgrad   reads  W            (dx = dy @ W^T)
    wgrad   writes dW           (dW = x^T @ dy)
    Adam    reads  dW, W, m, v; writes W', m, v

at ~2.4 GB/step for f32 moments. This kernel computes dgrad + wgrad + the
Adam update for dense1 in ONE pass over the weight: per 256-row K-tile it
reads {W, m, v}, computes the tile's dx slice and gradient on the MXU, and
writes {W', m', v'} — the gradient never exists in HBM.

    traffic: f32 moments  2.42 GB -> 1.81 GB;  bf16 moments -> 1.21 GB

Semantics are exactly ``optax.adam`` (scale_by_adam + scale(-lr), b1=0.9,
b2=0.999, eps=1e-8, bias correction from ``count``) — pinned by
tests/test_pallas_head.py against the jnp closed form and against the
unfused train step. The moment storage dtype is the caller's (f32 or bf16,
engine/gan._adam parity either way); all update math runs in f32.

Used by engine/gan._train_step_core when ``config.d_head_fused`` — the D
loss backward is restructured there: trunk cotangents flow through a normal
``jax.vjp`` while this kernel consumes the manually-derived head cotangent
(BCE -> dense2 -> LeakyReLU closed forms, a few (B,1024) tensors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B1, _B2, _EPS = 0.9, 0.999, 1e-8  # optax.adam / torch.optim.Adam defaults
_TK = 256  # K-tile rows: {W,m,v} x {in,out} + double buffering <= ~8 MB VMEM


def _kernel(sc_ref, w_ref, m_ref, v_ref, f_ref, dy_ref,
            dx_ref, w2_ref, m2_ref, v2_ref):
    bc1 = sc_ref[0, 0]
    bc2 = sc_ref[0, 1]
    lr = sc_ref[0, 2]
    w = w_ref[:]                                   # (TK, N) f32
    dy = dy_ref[:]                                 # (B, N)  activation dtype
    # dgrad slice: dx[:, tile] = dy @ W_tile^T — W cast to the activation
    # dtype exactly like the unfused flax Dense backward (bf16 MXU pass)
    dx_ref[:] = jax.lax.dot_general(
        dy, w.astype(dy.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    # wgrad tile: dW_tile = x_tile^T @ dy, f32 accumulation on the MXU
    g = jax.lax.dot_general(
        f_ref[:], dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (TK, N)
    # Adam in f32 (optax.scale_by_adam + scale(-lr) closed form)
    m32 = _B1 * m_ref[:].astype(jnp.float32) + (1.0 - _B1) * g
    v32 = _B2 * v_ref[:].astype(jnp.float32) + (1.0 - _B2) * g * g
    w2_ref[:] = w - lr * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + _EPS)
    m2_ref[:] = m32.astype(m2_ref.dtype)
    v2_ref[:] = v32.astype(v2_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_bwd_adam(w, m, v, feats, dy, count, lr, *, interpret=False):
    """One-pass dense1 backward + Adam update.

    Args:
      w: (K, N) f32 master weight.
      m, v: (K, N) Adam moments (f32 or bf16 storage; f32 math).
      feats: (B, K) layer input (activation dtype).
      dy: (B, N) cotangent of the layer OUTPUT (pre-bias-add cotangent ==
        post: bias grad is handled by the caller as sum(dy)).
      count: () int32 — the POST-increment Adam step (optax count + 1).
      lr: python float or () array learning rate.

    Returns (dx (B, K) feats-dtype, w', m', v').
    """
    K, N = w.shape
    B = feats.shape[0]
    assert feats.shape == (B, K) and dy.shape == (B, N), (feats.shape, dy.shape)
    assert m.shape == w.shape and v.shape == w.shape
    assert K % _TK == 0, (K, _TK)
    cf = count.astype(jnp.float32)
    scalars = jnp.stack([1.0 - _B1 ** cf, 1.0 - _B2 ** cf,
                         jnp.asarray(lr, jnp.float32), 0.0]).reshape(1, 4)
    dy = dy.astype(feats.dtype)

    grid = (K // _TK,)
    row = lambda i: (i, 0)   # noqa: E731 — K-tile index maps
    col = lambda i: (0, i)   # noqa: E731

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TK, N), row, memory_space=pltpu.VMEM),   # w
            pl.BlockSpec((_TK, N), row, memory_space=pltpu.VMEM),   # m
            pl.BlockSpec((_TK, N), row, memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((B, _TK), col, memory_space=pltpu.VMEM),   # feats
            pl.BlockSpec((B, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                  # dy
        ],
        out_specs=[
            pl.BlockSpec((B, _TK), col, memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((_TK, N), row, memory_space=pltpu.VMEM),   # w'
            pl.BlockSpec((_TK, N), row, memory_space=pltpu.VMEM),   # m'
            pl.BlockSpec((_TK, N), row, memory_space=pltpu.VMEM),   # v'
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K), feats.dtype),
            jax.ShapeDtypeStruct((K, N), w.dtype),
            jax.ShapeDtypeStruct((K, N), m.dtype),
            jax.ShapeDtypeStruct((K, N), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * K * N,
            bytes_accessed=(w.size * 4 * 2 + m.size * m.dtype.itemsize * 2
                            + v.size * v.dtype.itemsize * 2),
            transcendentals=0),
        interpret=interpret,
    )(scalars, w, m, v, feats, dy)


def head_bwd_adam_reference(w, m, v, feats, dy, count, lr):
    """jnp closed form of head_bwd_adam (tests + the interpret-free CPU
    fallback). Same math, XLA streams instead of one fused pass."""
    dy = dy.astype(feats.dtype)
    dx = jax.lax.dot_general(dy, w.astype(dy.dtype), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(feats.dtype)
    g = jax.lax.dot_general(feats, dy, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    cf = count.astype(jnp.float32)
    m32 = _B1 * m.astype(jnp.float32) + (1.0 - _B1) * g
    v32 = _B2 * v.astype(jnp.float32) + (1.0 - _B2) * g * g
    w2 = w - jnp.asarray(lr, jnp.float32) * (m32 / (1.0 - _B1 ** cf)) / (
        jnp.sqrt(v32 / (1.0 - _B2 ** cf)) + _EPS)
    return dx, w2, m32.astype(m.dtype), v32.astype(v.dtype)
