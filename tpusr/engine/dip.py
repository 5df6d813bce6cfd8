"""DIP engine — per-image Deep Image Prior super-resolution, fully on-chip.

Capability parity with ``DIP_ISR`` (DIP.py:22-123) + the Adam loop of
``utils/DIP.py:33-40``, re-designed for TPU:

The reference runs each Adam iteration as ~40 separate CUDA kernel launches
driven from Python (SURVEY.md §3.1). Here the ENTIRE optimization — reg-noise
draw, skip-net forward, Lanczos downsample, MSE, backward, Adam update, and
periodic PSNR/SSIM/LPIPS evaluation — is one jitted program: an outer
``lax.scan`` over log-chunks wrapping an inner ``lax.scan`` over iterations.
Host↔device traffic is two transfers total (LR/HR in, resolved image +
metric curves out).

Faithful semantics:
  * fresh net, torch-init distribution, fixed uniform z*0.1 (utils/DIP.py:79-96)
  * per-iter z' = z + N(0,1)*reg_noise_std (DIP.py:51-52)
  * loss = MSE(lanczos2_downsample(net(z')), LR) (DIP.py:60-65)
  * Adam(lr) over net params only (DIP.py:98, 'net' opt_over)
  * metrics on the current HR estimate every log_freq iters, starting at 0
    (DIP.py:71-87)
  * final image = net(net_input) with the LAST reg-noise draw still applied
    (DIP.py:51-52 reassignment + :102); metrics curves use the clean z
    forward (small documented divergence from the reference's noisy
    in-closure metrics)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpusr.engine.metrics import psnr as psnr_fn
from tpusr.engine.metrics import ssim as ssim_fn
from tpusr.models.skip import SkipNet, build_dip_net
from tpusr.ops.resample import Downsampler


@dataclasses.dataclass(frozen=True)
class DIPConfig:
    """DIP.py main() defaults (DIP.py:169-174, 318-336)."""

    factor: int = 8
    num_iter: int = 1000
    learning_rate: float = 0.01
    reg_noise_std: float = 0.05
    log_freq: int = 100
    input_depth: int = 32
    input_noise_scale: float = 0.1  # 'var' of get_noise (utils/DIP.py:79)
    pad: str = "reflection"
    upsample_mode: str = "bilinear"
    skip_n33d: int = 128
    skip_n33u: int = 128
    skip_n11: int = 4
    num_scales: int = 5
    dtype: str = "float32"
    # reference surface beyond DIP.py's defaults:
    optimizer: str = "adam"        # 'adam' | 'lbfgs' (utils/DIP.py:7-42)
    input_method: str = "noise"    # 'noise' | 'meshgrid' (utils/DIP.py:89-101)
    # comma-separated subset of {'net','input','down'} (utils/DIP.py:44-68);
    # 'down' makes the full 2-D lanczos kernel a trainable leaf, like the
    # reference making its downsampler conv weights require grad
    opt_over: str = "net"
    lbfgs_memory: int = 10
    # 'zoom' (default): optax strong-Wolfe zoom linesearch — better
    # conditioned, but it supersedes learning_rate. 'fixed': torch-exact
    # stepping (utils/DIP.py:30 passes lr as torch LBFGS's FIXED step with
    # line_search_fn=None) — the parity mode for reference LBFGS runs.
    lbfgs_line_search: str = "zoom"
    # The reference resolves the final image with the LAST reg-noise draw
    # still applied (DIP.py:102). resolve_clean=True uses the un-noised
    # input instead — usually slightly better PSNR (opt-in divergence).
    resolve_clean: bool = False
    # Pallas fused-conv dataflow (models/skip.py): 'auto' on TPU backends,
    # 'off' forces pure XLA. The vmapped batch path forces 'off' (pallas
    # batching under vmap-over-params is not exercised).
    conv_fusion: str = "auto"


def lbfgs_fixed_step_tx(learning_rate: float,
                        memory_size: int) -> optax.GradientTransformation:
    """Torch-exact L-BFGS stepping: fixed step size, no line search.

    Reproduces ``torch.optim.LBFGS(lr, line_search_fn=None)`` exactly as the
    reference uses it (utils/DIP.py:19-31 with tolerance_grad=-1,
    tolerance_change=-1, so the tolerance early-exits never trigger):

      * two-loop recursion over a flat parameter vector with
        H_diag = y.s/y.y recomputed ONLY when the curvature condition
        y.s > 1e-10 admits the new (s, y) pair (torch/optim/lbfgs.py);
      * s is the step actually taken (prev_d * prev_t), y the grad diff;
      * step size t = lr on every iteration EXCEPT the first, where torch
        takes t = min(1, 1/||g||_1) * lr.

    Not built on ``optax.scale_by_lbfgs``: that transform seeds its memory
    from a zero-initialized state (first pair s=params, y=grads), so its
    first two directions diverge from torch's (measured; its zoom-linesearch
    consumer doesn't care about direction scale, we do). Golden-tested
    against torch.optim.LBFGS trajectories in tests/test_dip_variants.py.
    Update takes plain grads — no value/value_fn plumbing.

    Invalid memory slots hold s=y=0 and rho=0, which makes their two-loop
    contributions exactly zero — no masking needed.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        n = flat.shape[0]
        z = jnp.zeros((memory_size, n), jnp.float32)
        return {
            "s_mem": z, "y_mem": z, "rho": jnp.zeros((memory_size,)),
            "prev_g": jnp.zeros((n,)), "prev_d": jnp.zeros((n,)),
            "prev_t": jnp.zeros(()), "h_diag": jnp.ones(()),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        del params
        g_raw, unravel = ravel_pytree(grads)
        g = g_raw.astype(jnp.float32)
        first = state["count"] == 0

        # memory admission (iterations >= 2 in torch numbering)
        y = g - state["prev_g"]
        s = state["prev_d"] * state["prev_t"]
        ys = jnp.vdot(y, s)
        good = jnp.logical_and(jnp.logical_not(first), ys > 1e-10)

        def admit(m, new_row):
            rolled = jnp.roll(m, -1, axis=0).at[-1].set(new_row)
            return jnp.where(good, rolled, m)

        s_mem = admit(state["s_mem"], s)
        y_mem = admit(state["y_mem"], y)
        rho = jnp.where(
            good,
            jnp.roll(state["rho"], -1).at[-1].set(1.0 / jnp.where(good, ys, 1.0)),
            state["rho"])
        h_diag = jnp.where(good, ys / jnp.vdot(y, y),
                           jnp.where(first, 1.0, state["h_diag"]))

        # two-loop recursion, statically unrolled over the memory buffer
        q = -g
        al = [None] * memory_size
        for i in reversed(range(memory_size)):
            al[i] = rho[i] * jnp.vdot(s_mem[i], q)
            q = q - al[i] * y_mem[i]
        r = h_diag * q
        for i in range(memory_size):
            be = rho[i] * jnp.vdot(y_mem[i], r)
            r = r + (al[i] - be) * s_mem[i]
        d = r

        t = jnp.where(first,
                      jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g)))
                      * learning_rate,
                      learning_rate)
        new_state = {
            "s_mem": s_mem, "y_mem": y_mem, "rho": rho,
            "prev_g": g, "prev_d": d, "prev_t": t, "h_diag": h_diag,
            "count": state["count"] + 1,
        }
        return unravel((t * d).astype(g_raw.dtype)), new_state

    return optax.GradientTransformation(init, update)


def _build(config: DIPConfig) -> tuple[SkipNet, Downsampler]:
    net = build_dip_net(
        input_depth=config.input_depth,
        pad=config.pad,
        upsample_mode=config.upsample_mode,
        skip_n33d=config.skip_n33d,
        skip_n33u=config.skip_n33u,
        skip_n11=config.skip_n11,
        num_scales=config.num_scales,
        dtype=None if config.dtype == "float32" else config.dtype,
        conv_fusion=config.conv_fusion,
    )
    downsampler = Downsampler(
        n_planes=3, factor=config.factor, kernel_type="lanczos2",
        phase=0.5, preserve_size=True)  # DIP.py:29
    return net, downsampler


def _dip_core(
    lr_image: jnp.ndarray,
    hr_image: jnp.ndarray,
    key: jax.Array,
    config: DIPConfig,
    lpips_fn: Callable | None = None,
    valid_hw: jnp.ndarray | None = None,
):
    """Super-resolve one image with DIP.

    Args:
      lr_image: (1, h, w, 3) float [0,1]
      hr_image: (1, H, W, 3) float [0,1] with H = factor*h (ground truth,
        used only for the metric curves, exactly like the reference)
      key: PRNG key — controls net init, input noise, and reg noise
      config: static hyperparameters
      lpips_fn: optional jittable LPIPS callable; curves carry NaN when None

    Returns:
      resolved: (1, H, W, 3) final HR estimate
      curves: dict of 'psnr'/'ssim'/'lpips' arrays of length num_iter//log_freq
    """
    net, downsampler = _build(config)
    # uint8 inputs are accepted and normalized on device — hosts (and slow
    # links) ship 1 byte/channel instead of 4
    if lr_image.dtype == jnp.uint8:
        lr_image = lr_image.astype(jnp.float32) / 255.0
    if hr_image.dtype == jnp.uint8:
        hr_image = hr_image.astype(jnp.float32) / 255.0
    h, w = hr_image.shape[1], hr_image.shape[2]

    k_init, k_input, k_reg = jax.random.split(key, 3)
    if config.input_method == "noise":
        z = (
            jax.random.uniform(k_input, (1, h, w, config.input_depth), jnp.float32)
            * config.input_noise_scale
        )
    elif config.input_method == "meshgrid":
        # utils/DIP.py:97-101: X,Y grids in [0,1]; requires input_depth == 2
        assert config.input_depth == 2, "meshgrid input requires input_depth=2"
        xg = jnp.linspace(0.0, 1.0, w)[None, None, :, None]
        yg = jnp.linspace(0.0, 1.0, h)[None, :, None, None]
        z = jnp.concatenate([
            jnp.broadcast_to(xg, (1, h, w, 1)),
            jnp.broadcast_to(yg, (1, h, w, 1)),
        ], axis=-1)
    else:
        raise ValueError(f"unknown input method {config.input_method!r}")

    variables = net.init(k_init, z)
    opt_parts = {p.strip() for p in config.opt_over.split(",")}
    unknown = opt_parts - {"net", "input", "down"}
    if unknown:
        raise ValueError(f"unknown opt_over parts {sorted(unknown)}")
    opt_input = "input" in opt_parts
    opt_down = "down" in opt_parts
    # trainables mirror get_params (utils/DIP.py:44-68): always the net,
    # optionally the input tensor and/or the downsampler kernel
    trainable = {"net": variables["params"]}
    if opt_input:
        trainable["z"] = z
    if opt_down:
        trainable["down"] = jnp.asarray(downsampler.kernel, jnp.float32)
    stats = variables["batch_stats"]

    def z_of(t):
        return t["z"] if opt_input else z

    if valid_hw is not None:
        # shape-bucketed mode: inputs are padded to a static bucket; the
        # true extent is a traced value -> ONE compile serves every image
        # in the bucket (each remote compile costs minutes; SURVEY.md §7
        # "dynamic image shapes vs XLA static shapes").
        from tpusr.engine.metrics import _valid_mask

        lr_valid = valid_hw // config.factor
        lr_mask = _valid_mask(lr_image.shape[1:3], lr_valid)
        lr_count = jnp.maximum(jnp.sum(lr_mask), 1.0) * lr_image.shape[-1]

    def perturb(zv, seed2):
        """z + reg_noise_std*N(0,1), deterministic in seed2 (int32[2]).

        The scan carries the SEED, not the 33 MB noise tensor, and the
        resolve regenerates the last draw from it (DIP.py:51-52,102
        parity). An on-chip-PRNG Pallas kernel for this (draw+add+cast in
        one pass) was built and measured: the kernel alone is fine
        (~0.3 ms incl. box-muller transcendentals) but its presence in the
        scan body cost ~1.7 ms/iter globally — XLA's fusion/scheduling
        around the custom call degraded every neighboring op (DESIGN.md
        round 3). jax.random with the same key material it is."""
        kk = jax.random.wrap_key_data(seed2.astype(jnp.uint32))
        n = jax.random.normal(kk, zv.shape, zv.dtype)
        return zv + n * config.reg_noise_std

    def loss_fn(t, st, seed2):
        if seed2 is not None and config.reg_noise_std > 0:
            z_iter = perturb(z_of(t), seed2)
        else:
            z_iter = z_of(t)
        out_hr, updates = net.apply(
            {"params": t["net"], "batch_stats": st}, z_iter, True,
            mutable=["batch_stats"])
        if opt_down:
            out_lr = downsampler.conv2d_with(out_hr, t["down"])
        else:
            out_lr = downsampler(out_hr)
        if valid_hw is None:
            loss = jnp.mean((out_lr - lr_image) ** 2)
        else:
            loss = jnp.sum(((out_lr - lr_image) ** 2) * lr_mask) / lr_count
        return loss, updates["batch_stats"]

    def make_sgd_iter(tx):
        def sgd_iter(carry, seed2):
            t, st, opt, _ = carry
            (loss, st), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                t, st, seed2)
            updates, opt = tx.update(grads, opt, t)
            t = optax.apply_updates(t, updates)
            # the last draw's SEED is carried (the draw is deterministic in
            # it): the reference resolves the final image with net_input
            # still holding the last noisy draw (DIP.py:51-52 + :102)
            return (t, st, opt, seed2), loss
        return sgd_iter

    def metrics_of(t, st):
        out_hr, _ = net.apply({"params": t["net"], "batch_stats": st},
                              z_of(t), True, mutable=["batch_stats"])
        if valid_hw is None:
            m_psnr = psnr_fn(out_hr, hr_image)
            m_ssim = ssim_fn(out_hr, hr_image, data_range=1.0)
        else:
            from tpusr.engine.metrics import psnr_masked, ssim_masked

            m_psnr = psnr_masked(out_hr, hr_image, valid_hw)
            m_ssim = ssim_masked(out_hr, hr_image, valid_hw)
        if lpips_fn is not None:
            m_lpips = lpips_fn(out_hr, hr_image)
        else:
            m_lpips = jnp.asarray(jnp.nan, jnp.float32)
        return m_psnr, m_ssim, m_lpips

    if config.num_iter >= config.log_freq:
        n_chunks, chunk_len = config.num_iter // config.log_freq, config.log_freq
    else:
        n_chunks, chunk_len = 1, config.num_iter
    remainder = config.num_iter - n_chunks * chunk_len
    k_reg, k_rem = jax.random.split(k_reg)
    reg_keys = jax.random.split(k_reg, (n_chunks, chunk_len))
    reg_seeds = jax.random.key_data(reg_keys).astype(jnp.int32)

    last_seed2 = jnp.zeros((2,), jnp.int32)
    if config.optimizer == "adam":
        tx = optax.adam(config.learning_rate)  # torch Adam defaults == optax
        step = make_sgd_iter(tx)
        carry = (trainable, stats, tx.init(trainable), last_seed2)

        def chunk(carry, keys):
            # metrics at the chunk head == iter % log_freq == 0 (DIP.py:71)
            m = metrics_of(carry[0], carry[1])
            carry, losses = jax.lax.scan(step, carry, keys)
            return carry, (m, losses[-1])

        carry, ((psnrs, ssims, lpipss), losses) = jax.lax.scan(
            chunk, carry, reg_seeds)
        if remainder > 0:
            rem_seeds = jax.random.key_data(
                jax.random.split(k_rem, remainder)).astype(jnp.int32)
            carry, _ = jax.lax.scan(step, carry, rem_seeds)
        trainable, stats, _, last_seed2 = carry
    elif config.optimizer == "lbfgs":
        # utils/DIP.py:19-31: 100 Adam warmup steps at lr 1e-3, then LBFGS.
        warm_tx = optax.adam(0.001)
        warm = make_sgd_iter(warm_tx)
        warm_seeds = jax.random.key_data(
            jax.random.split(k_rem, 100)).astype(jnp.int32)
        (trainable, stats, _, _), _ = jax.lax.scan(
            warm, (trainable, stats, warm_tx.init(trainable), last_seed2),
            warm_seeds)

        # LBFGS stage: deterministic objective (reg noise frozen at 0 —
        # a stochastic loss would defeat the line search; documented
        # divergence from the reference's noisy closure). The zoom
        # linesearch also SUPERSEDES config.learning_rate: the reference
        # passes lr as torch LBFGS's fixed step (utils/DIP.py:30,
        # line_search_fn=None), while optax's strong-Wolfe search picks the
        # step per iteration — better-conditioned, divergence in PARITY.md.
        det_loss = lambda t: loss_fn(t, stats, None)[0]
        if config.lbfgs_line_search == "fixed":
            # torch-exact parity mode: lr as the FIXED step, no linesearch
            # (utils/DIP.py:30; see lbfgs_fixed_step_tx)
            ftx = lbfgs_fixed_step_tx(config.learning_rate,
                                      config.lbfgs_memory)

            def lbfgs_iter(carry, _):
                t, opt = carry
                value, grads = jax.value_and_grad(det_loss)(t)
                updates, opt = ftx.update(grads, opt, t)
                t = optax.apply_updates(t, updates)
                return (t, opt), value

            tx = ftx
        elif config.lbfgs_line_search == "zoom":
            tx = optax.lbfgs(memory_size=config.lbfgs_memory)
            vg = optax.value_and_grad_from_state(det_loss)

            def lbfgs_iter(carry, _):
                t, opt = carry
                value, grads = vg(t, state=opt)
                updates, opt = tx.update(grads, opt, t, value=value,
                                         grad=grads, value_fn=det_loss)
                t = optax.apply_updates(t, updates)
                return (t, opt), value
        else:
            raise ValueError(
                f"unknown lbfgs_line_search {config.lbfgs_line_search!r}")

        def lchunk(carry, _):
            t, opt = carry
            m = metrics_of(t, stats)
            (t, opt), losses = jax.lax.scan(lbfgs_iter, (t, opt), None,
                                            length=chunk_len)
            return (t, opt), (m, losses[-1])

        (trainable, lopt), ((psnrs, ssims, lpipss), losses) = jax.lax.scan(
            lchunk, (trainable, tx.init(trainable)), None, length=n_chunks)
        if remainder > 0:
            (trainable, lopt), _ = jax.lax.scan(
                lbfgs_iter, (trainable, lopt), None, length=remainder)
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")

    # reference parity: the final image is net(net_input) with net_input
    # still holding the LAST reg-noise-perturbed draw (DIP.py:102) —
    # regenerated here from the carried seed (identical draw). The lbfgs
    # path and num_iter==0 resolve un-noised, exactly as before (the old
    # code carried zeros there).
    z_final = z_of(trainable)
    if (not config.resolve_clean and config.reg_noise_std > 0
            and config.optimizer == "adam" and config.num_iter > 0):
        z_final = perturb(z_final, last_seed2)
    resolved, _ = net.apply({"params": trainable["net"], "batch_stats": stats},
                            z_final, True, mutable=["batch_stats"])
    curves = {"psnr": psnrs, "ssim": ssims, "lpips": lpipss, "loss": losses}
    return resolved, curves


@partial(jax.jit, static_argnames=("config", "lpips_fn"))
def dip_superresolve(lr_image, hr_image, key, config: DIPConfig,
                     lpips_fn: Callable | None = None):
    """Single-image DIP (see _dip_core docstring)."""
    return _dip_core(lr_image, hr_image, key, config, lpips_fn)


@partial(jax.jit, static_argnames=("config", "lpips_fn"))
def dip_superresolve_bucketed(lr_image, hr_image, valid_hw, key,
                              config: DIPConfig,
                              lpips_fn: Callable | None = None):
    """Shape-bucketed single-image DIP.

    lr/hr are zero-padded (bottom/right) to a static bucket size; valid_hw
    is the true (H, W) of the HR image as a traced int array. Loss and
    metric curves are masked to the valid region; the caller crops the
    returned (padded) image to valid_hw on the host. One XLA program per
    bucket instead of one per unique image shape.
    """
    return _dip_core(lr_image, hr_image, key, config, lpips_fn,
                     valid_hw=jnp.asarray(valid_hw, jnp.int32))


def pad_to_bucket(arr, bucket: int):
    """Pad NHWC (or HWC) bottom/right with zeros to multiples of bucket.

    Returns (padded, (h, w)) with the original spatial size.
    """
    import numpy as np

    spatial = (-3, -2)
    h, w = arr.shape[spatial[0]], arr.shape[spatial[1]]
    ph = (-h) % bucket
    pw = (-w) % bucket
    if ph == 0 and pw == 0:
        return arr, (h, w)
    pad = [(0, 0)] * arr.ndim
    pad[spatial[0]] = (0, ph)
    pad[spatial[1]] = (0, pw)
    return np.pad(np.asarray(arr), pad), (h, w)


@partial(jax.jit, static_argnames=("config", "lpips_fn"))
def dip_superresolve_batch_bucketed(lr_images, hr_images, valid_hws, keys,
                                    config: DIPConfig,
                                    lpips_fn: Callable | None = None):
    """vmap-batched + shape-bucketed DIP (concurrent lanes).

    Measured on v5e (DESIGN.md): per-lane conv kernels lower to grouped
    convolutions that run ~2x slower per image than plain convs — on a
    single chip prefer ``dip_superresolve_scan_bucketed``; this form is the
    per-device body of the multi-chip shard_map path (1 lane/device keeps
    the convs plain).
    """
    config = dataclasses.replace(config, conv_fusion="off")
    fn = lambda lr, hr, v, k: _dip_core(lr, hr, k, config, lpips_fn,
                                        valid_hw=v)
    return jax.vmap(fn)(lr_images, hr_images,
                        jnp.asarray(valid_hws, jnp.int32), keys)


@partial(jax.jit, static_argnames=("config", "lpips_fn"))
def dip_superresolve_scan_bucketed(lr_images, hr_images, valid_hws, keys,
                                   config: DIPConfig,
                                   lpips_fn: Callable | None = None):
    """Sequential-on-device multi-image DIP: one dispatch, one compiled
    program, images optimized back to back via ``lax.map`` (scan) — plain
    convs at full speed, and the per-dispatch overhead of remote/tunneled
    deployments is paid once per group instead of once per image."""
    def fn(args):
        lr, hr, v, k = args
        return _dip_core(lr, hr, k, config, lpips_fn, valid_hw=v)

    return jax.lax.map(
        fn, (lr_images, hr_images, jnp.asarray(valid_hws, jnp.int32), keys))


@partial(jax.jit, static_argnames=("config", "lpips_fn"))
def dip_superresolve_batch(lr_images, hr_images, keys, config: DIPConfig,
                           lpips_fn: Callable | None = None):
    """vmapped multi-image DIP — BASELINE config 4 (batched DIP).

    Args are stacked along a leading axis: lr (N, 1, h, w, 3),
    hr (N, 1, H, W, 3), keys (N,). Each lane optimizes an independent fresh
    net; under a ('data',) mesh the leading axis shards across devices
    (see tpusr/parallel/dip_batch.py), giving images-per-chip scaling with
    zero collectives (DIP is embarrassingly parallel).
    """
    config = dataclasses.replace(config, conv_fusion="off")
    fn = lambda lr, hr, k: _dip_core(lr, hr, k, config, lpips_fn)
    return jax.vmap(fn)(lr_images, hr_images, keys)
