"""Batched DIP across a device mesh — BASELINE config 4.

DIP optimizes an independent fresh network per image, so multi-image DIP is
embarrassingly parallel: vmap gives N images per chip (one XLA program, convs
batched onto the MXU), and sharding the vmap lane axis over a ('data',) mesh
scales across chips with zero collectives. This replaces the reference's
serial per-image Python loop (DIP.py:164-208).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusr.engine.dip import DIPConfig, dip_superresolve_batch


def dip_superresolve_sharded(
    lr_images,
    hr_images,
    keys,
    config: DIPConfig,
    mesh: Mesh,
    lpips_fn: Callable | None = None,
    axis: str = "data",
):
    """Run batched DIP with the image axis sharded across ``mesh``.

    lr (N, 1, h, w, 3) / hr (N, 1, H, W, 3) / keys (N,) with N divisible by
    the mesh axis size. shard_map is used rather than sharding propagation:
    vmap lowers the per-lane conv kernels into grouped convolutions, which
    GSPMD cannot split along the group dimension — shard_map sidesteps that
    by tracing an independent local vmap per device (zero collectives, as
    DIP is embarrassingly parallel).
    """
    fn = jax.shard_map(
        lambda lr, hr, k: dip_superresolve_batch(lr, hr, k, config, lpips_fn),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(lr_images, hr_images, keys)
