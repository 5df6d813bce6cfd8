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
    upscaled cores concatenate across the mesh. EXACT (incl. the true image
    edges) when slab >= 2*halo: edge shards shift their window inward (same
    clamped-window geometry as the tiled path) using one extra single-pair
    ppermute, so the generator's zero padding lands exactly on the true
    image boundary. When halo <= slab < 2*halo it falls back to the legacy
    zero-filled edge halo (interior-exact only, warned).

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
    if n == 1:
        return generator_forward(params_G, stats_G, lr_image, config,
                                 train=False)
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
    edge_exact = 2 * halo <= slab
    if not edge_exact:
        import warnings

        warnings.warn(
            f"slab height {slab} < 2*halo ({2 * halo}): edge shards cannot "
            f"shift their window inward, falling back to zero-filled edge "
            f"halos — output is interior-exact only. Use fewer shards (or "
            f"tiled_generator_forward) for full exactness.",
            stacklevel=2)
    f = config.factor

    fwd = partial(_slab_forward, config=config, halo=halo, f=f,
                  axis=axis, n=n, edge_exact=edge_exact)
    shmap = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return shmap(params_G, stats_G, lr_image)


def _slab_forward(params_G, stats_G, slab, *, config, halo, f, axis, n,
                  edge_exact):
    """Per-device body: exchange halos, run generator, crop the core.

    edge_exact=True (requires slab >= 2*halo): edge shards build an
    inward-shifted window of REAL image rows — the same clamped-window
    geometry as ``tiled_generator_forward`` — so the generator's per-layer
    zero padding falls exactly on the true image boundary (a zero-filled
    halo is NOT equivalent: after the first conv+bias+activation, zero
    input rows become nonzero feature rows, unlike true-boundary padding).
    The extra rows edge shards need (2*halo from their single neighbor)
    ride one additional single-pair ppermute each.
    """
    top_rows = slab[:, :halo]       # my top rows -> lower neighbor's bottom halo
    bottom_rows = slab[:, -halo:]   # my bottom rows -> upper neighbor's top halo

    # receive the upper neighbor's bottom rows (device i <- i-1)
    from_above = lax.ppermute(bottom_rows, axis,
                              perm=[(i, i + 1) for i in range(n - 1)])
    # receive the lower neighbor's top rows (device i <- i+1)
    from_below = lax.ppermute(top_rows, axis,
                              perm=[(i + 1, i) for i in range(n - 1)])

    if not edge_exact:
        # legacy fallback: zero-filled halos at the true image edges
        padded = jnp.concatenate([from_above, slab, from_below], axis=1)
        out = generator_forward(params_G, stats_G, padded, config, train=False)
        return out[:, halo * f:-halo * f if halo else None]

    # second (single-pair) exchanges: device 0 also needs its neighbor's
    # rows [halo:2halo); device n-1 its neighbor's rows [-2halo:-halo)
    from_below2 = lax.ppermute(slab[:, halo:2 * halo], axis, perm=[(1, 0)])
    from_above2 = lax.ppermute(slab[:, -2 * halo:-halo], axis,
                               perm=[(n - 2, n - 1)])

    # one (slab + 4*halo)-row strip; every device's window is a
    # (slab + 2*halo)-row dynamic slice of it:
    #   interior i: start=halo   -> rows [i*slab - halo, (i+1)*slab + halo)
    #   top (0):    start=2*halo -> rows [0, slab + 2*halo)        true edge
    #   bottom:     start=0      -> rows [h - slab - 2*halo, h)    true edge
    strip = jnp.concatenate(
        [from_above2, from_above, slab, from_below, from_below2], axis=1)
    slab_h = slab.shape[1]  # static per-device slab height
    idx = lax.axis_index(axis)
    is_top = idx == 0
    is_bottom = idx == n - 1
    start = jnp.where(is_top, 2 * halo, jnp.where(is_bottom, 0, halo))
    window = lax.dynamic_slice_in_dim(strip, start, slab_h + 2 * halo, axis=1)

    out = generator_forward(params_G, stats_G, window, config, train=False)
    # core offset inside the upscaled window mirrors the window shift
    core_off = jnp.where(is_top, 0, jnp.where(is_bottom, 2 * halo, halo)) * f
    return lax.dynamic_slice_in_dim(out, core_off, slab_h * f, axis=1)
