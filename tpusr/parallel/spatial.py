"""Spatial parallelism for full-image SR inference — the CP/SP analog.

The reference copes with big images by shrinking them (mandatory /2,
dataset.py:21-23) and running eval at batch 1 (eval_GAN.py:88). Here large
inputs scale two ways (SURVEY.md §2.3, §5 long-context row):

  * ``tiled_generator_forward`` — EXACT overlap-and-discard tiling: windows
    of uniform size are clamped inside the image (so true edges keep the
    per-layer zero-padding behavior of a full forward), batched into one
    generator call (MXU-friendly), and the upscaled cores are reassembled.
    Exact for halo >= the generator's LR-domain receptive field.

  * ``sharded_generator_forward`` — shard_map over a 'spatial' mesh axis:
    each device holds an H-slab, halo rows are exchanged with neighbors via
    ``lax.ppermute`` (ICI traffic only), the generator runs per-slab, and the
    upscaled cores concatenate across the mesh. Interior-exact; within a
    receptive field of the true top/bottom edge the zero-filled halo is an
    approximation (documented).

Generator receptive field at LR: stem k9 (4) + 2*k3 per residual block +
post k3 (1) => 4 + 4*n_res/2... conservatively 2*n_res + 6; halo defaults
derive from the config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusr.engine.gan import GANTrainConfig, generator_forward


def generator_receptive_halo(config: GANTrainConfig) -> int:
    """LR-domain halo covering the pre-upsample receptive field, padded."""
    return 2 * config.residual_blocks_count + 16


@partial(jax.jit, static_argnames=("config", "n_tiles", "halo"))
def tiled_generator_forward(
    params_G,
    stats_G,
    lr_image: jnp.ndarray,
    config: GANTrainConfig,
    n_tiles: int = 4,
    halo: int | None = None,
):
    """Exact tiled full-image inference.

    lr_image: (1, H, W, 3). Tiles split H; each window is a uniform-size
    in-image slice (edge windows shift inward), so every tile sees genuine
    pixels plus the true image boundary where applicable.
    """
    if halo is None:
        halo = generator_receptive_halo(config)
    _, h, w, _ = lr_image.shape
    f = config.factor

    core = -(-h // n_tiles)  # ceil
    window = min(h, core + 2 * halo)

    windows = []
    offsets = []
    for i in range(n_tiles):
        c0 = i * core
        if c0 >= h:
            break  # h < n_tiles*core: the image is fully covered already
        c1 = min(c0 + core, h)
        w0 = min(max(c0 - halo, 0), h - window)
        windows.append(lax.dynamic_slice(
            lr_image, (0, w0, 0, 0), (1, window, w, 3))[0])
        offsets.append((c0 - w0, c1 - c0))

    batch = jnp.stack(windows)  # (n_tiles, window, W, 3)
    out = generator_forward(params_G, stats_G, batch, config, train=False)

    parts = []
    for i, (off, clen) in enumerate(offsets):
        parts.append(out[i, off * f:(off + clen) * f])
    return jnp.concatenate(parts, axis=0)[None]


def sharded_generator_forward(
    params_G,
    stats_G,
    lr_image: jnp.ndarray,
    config: GANTrainConfig,
    n_shards: int | None = None,
    halo: int | None = None,
    mesh: Mesh | None = None,
    axis: str = "spatial",
):
    """Distributed full-image inference: H-slabs per device + ppermute halos.

    lr_image: (1, H, W, 3) with H divisible by the shard count.
    """
    if halo is None:
        halo = generator_receptive_halo(config)
    if mesh is None:
        from tpusr.parallel.mesh import make_mesh

        n = n_shards or len(jax.devices())
        mesh = make_mesh({axis: n})
    n = mesh.shape[axis]
    _, h, w, _ = lr_image.shape
    if h % n != 0:
        raise ValueError(f"image height {h} not divisible by {n} shards")
    slab = h // n
    if halo > slab:
        # ppermute exchanges at most one full neighbor slab; clamping below
        # the receptive field voids the interior-exactness guarantee.
        import warnings

        warnings.warn(
            f"spatial halo clamped from {halo} to slab height {slab} "
            f"(< receptive halo {generator_receptive_halo(config)}): "
            f"interior shard boundaries are now approximate. Use fewer "
            f"shards or tiled_generator_forward for exact output.",
            stacklevel=2)
        halo = slab
    f = config.factor

    fwd = partial(_slab_forward, config=config, halo=halo, f=f,
                  axis=axis, n=n)
    shmap = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return shmap(params_G, stats_G, lr_image)


def _slab_forward(params_G, stats_G, slab, *, config, halo, f, axis, n):
    """Per-device body: exchange halos, run generator, crop the core."""
    top_rows = slab[:, :halo]       # my top rows -> lower neighbor's bottom halo
    bottom_rows = slab[:, -halo:]   # my bottom rows -> upper neighbor's top halo

    # receive the upper neighbor's bottom rows (device i <- i-1)
    from_above = lax.ppermute(bottom_rows, axis,
                              perm=[(i, i + 1) for i in range(n - 1)])
    # receive the lower neighbor's top rows (device i <- i+1)
    from_below = lax.ppermute(top_rows, axis,
                              perm=[(i + 1, i) for i in range(n - 1)])
    # edge devices receive zeros from the non-cyclic permute — the true image
    # boundary approximation documented above.

    padded = jnp.concatenate([from_above, slab, from_below], axis=1)
    out = generator_forward(params_G, stats_G, padded, config, train=False)
    return out[:, halo * f:-halo * f if halo else None]
