"""SRGAN training / evaluation engine — jitted alternating D/G steps.

Capability parity with ``GAN_ISR_train`` / ``do_epoch`` (train_GAN.py:22-136)
and ``GAN_ISR_Batch_eval`` (eval_GAN.py:21-69), re-designed for TPU:

  * One jitted ``gan_train_step`` performs the full D update + G update —
    no per-op launches, no host round-trips inside a step.
  * Both discriminator applications (real batch, fake batch) keep the
    reference's *separate* batch-norm statistics per call ordering.
  * The reference's G update feeds the adversarial term a DETACHED generator
    output (train_GAN.py:58), so no adversarial gradient ever reaches G —
    a documented reference bug. Default here is the intended SRGAN loss
    (gradient flows); ``legacy_detach=True`` reproduces the reference
    behavior for parity runs (SURVEY.md §7 build-order note 6).
  * Optimizers: fresh Adam per phase (train_GAN.py:35-36) — callers create a
    new state per phase via ``create_gan_state``/``reset_optimizers``.
"""

from __future__ import annotations

import dataclasses
import os as _os
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpusr.engine import losses as L
from tpusr.models.srgan import Discriminator, Generator

# Routing defaults, resolved ONCE at import (never at trace time — a
# trace-time env read is not part of the jit cache key, so flipping the env
# after the first trace silently keeps the old route; VERDICT r3 weak #5).
# The subprocess A/B tools (tools/ab_g_fuse.py etc.) set these before
# launching Python; in-process callers use dataclasses.replace on the config.
_D_CONCAT_DEFAULT = _os.environ.get("TPUSR_D_CONCAT", "1") != "0"
_G_FUSE_DEFAULT = {"0": "off", "train": "train"}.get(
    _os.environ.get("TPUSR_G_FUSE", "1"), "eval")
_D_MOMENTS_DEFAULT = _os.environ.get("TPUSR_D_MOMENTS", "bf16")
# default 'bf16' ROUTED after winning its full-step A/B +8% (588.6-589.2 vs
# 545.1-545.2 patches/s, interleaved rounds) with endpoint-quality parity
# (13.08 vs 13.32 dB, same protocol that routed d_moments) —
# docs/evidence_r5/ab_d_params.log, ab_d_params_quality.log. bf16 weight
# storage requires the f32 update math only the bf16-moment transform
# provides, so an f32-moments default (env opt-out) pairs with f32 params.
_D_PARAMS_DEFAULT = _os.environ.get(
    "TPUSR_D_PARAMS", "bf16" if _D_MOMENTS_DEFAULT == "bf16" else "f32")


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    """train_GAN.py defaults (:216-219, :169, :270)."""

    factor: int = 8
    batch_size: int = 8
    hr_patch: int = 192
    pre_train_epochs: int = 8000
    fine_tune_epochs: int = 4000
    pre_train_lr: float = 1e-4
    fine_tune_lr: float = 1e-5
    residual_blocks_count: int = 16
    legacy_detach: bool = False  # reproduce train_GAN.py:58 exactly
    # reproduce the reference's double-/255 scaling bug (dataset.py:151-157)
    # in the ON-DEVICE cropper too, so parity runs keep the fast path
    legacy_scale: bool = False
    content: str = "auto"  # 'auto' | 'vgg' | 'mse'
    dtype: str | None = None  # 'bfloat16' activations (params stay f32)
    # adversarial term coefficient in the G loss. 1.0 = the reference's
    # unweighted sum (utils/GAN.py:121); 1e-3 = the SRGAN paper coefficient
    # (opt-in extension — see losses.perceptual_loss)
    adv_weight: float = 1.0
    # True: the D update runs concat(real, fake) as ONE batch-2B application
    # with per-group BN stats — exactly the reference's two sequential calls
    # (train_GAN.py:44-48) but every conv/GEMM streams its weights once.
    # Measured +9% full-step (DESIGN.md "concat-D update"). False = the
    # sequential two-call form (A/B hook; env TPUSR_D_CONCAT=0 seeds it).
    d_concat: bool = _D_CONCAT_DEFAULT
    # Fused-Pallas-conv routing for the generator: 'eval' (default) fuses the
    # batch-1 full-image EVAL forward only (measured +19% on the x8 eval
    # bench); 'train' additionally fuses the training G (measured slightly
    # negative at the reference workload — A/B hook); 'off' keeps the
    # banded-XLA path everywhere. Env TPUSR_G_FUSE (0|1|train) seeds the
    # default at import.
    g_fuse: str = _G_FUSE_DEFAULT
    # Kernel-mode override for the fused convs: 'auto' (hardware when
    # available) | 'off' | 'interpret' (CPU tests of the fused dataflow) —
    # see models/layers.fusion_mode.
    conv_fusion: str = "auto"
    # Storage dtype of the DISCRIMINATOR's Adam moments (m and v). The 80M-
    # param D sits at the optimizer bandwidth floor (~2.7 ms/step of pure
    # HBM traffic, DESIGN.md "D dense head"); 'bf16' stores both moments in
    # bfloat16 (update math stays f32) cutting the Adam stream from 28 to
    # 16 bytes/param. DEFAULT since round 4: measured +6% full-step with
    # loss-trajectory + endpoint-quality neutrality (docs/evidence_r4/
    # d_moments_neutrality.log, ab_d_moments_quality*.log; PARITY.md row).
    # 'f32' restores plain optax.adam (torch-exact optimizer state dtypes).
    # The G's moments stay f32 (1.7M params — nothing to win, and DIP/G
    # trajectories stay bit-identical). Env TPUSR_D_MOMENTS seeds the
    # default at import (A/B tooling); --d_moments on the CLI.
    d_moments: str = _D_MOMENTS_DEFAULT  # 'bf16' | 'f32'
    # Storage dtype of the DISCRIMINATOR's LARGE weights (leaves >= 1M
    # elements: the 75.5M dense-1 kernel + the two widest conv kernels —
    # ~79M of D's 80M params). The D step is weight-streaming bound: the
    # dense kernel is read by BOTH the forward and dgrad GEMMs and then by
    # Adam (DESIGN.md "D dense head at its bandwidth floor"); storing it
    # bf16 halves every one of those streams. Update math stays f32
    # (optax.apply_updates computes p+u in f32 and casts back; requires
    # d_moments='bf16' whose EMA math is f32 — plain optax.adam would run
    # its moment math in the params' bf16). Small leaves (BN affines,
    # biases, thin convs) stay f32. A/B-gated like d_moments was;
    # env TPUSR_D_PARAMS seeds the default, --d_params on the CLI.
    d_params: str = _D_PARAMS_DEFAULT  # 'f32' | 'bf16'


# d_params='bf16' casts only leaves at least this big (the traffic win);
# BN affines / biases / small conv kernels keep full precision
_D_PARAMS_BF16_MIN_SIZE = 1 << 20


def _cast_large_d_params(params_D, d_params: str):
    if d_params == "f32":
        return params_D
    assert d_params == "bf16", d_params
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if p.size >= _D_PARAMS_BF16_MIN_SIZE else p, params_D)


def _adam(learning_rate: float, moments: str = "f32"):
    """Adam with selectable moment STORAGE dtype.

    'f32' returns plain ``optax.adam`` (bit-identical state trees with every
    existing checkpoint). 'bf16' stores both moments in bfloat16 while all
    update arithmetic (EMA, bias correction, rsqrt) runs in f32 — the same
    trade optax's ``mu_dtype`` makes for m, extended to v. The v EMA is the
    slow-moving square magnitude; bf16's ~0.4% relative storage error
    perturbs the per-step update direction by <0.2%, which the loss-
    neutrality A/B must confirm before routing (VERDICT r3 #2).
    """
    if moments == "f32":
        return optax.adam(learning_rate)
    assert moments == "bf16", moments
    b1, b2, eps = 0.9, 0.999, 1e-8  # optax.adam / torch.optim.Adam defaults

    # The state tree mirrors optax.adam's (ScaleByAdamState, EmptyState)
    # EXACTLY (only leaf dtypes differ) so orbax checkpoints restore across
    # d_moments settings — load_checkpoint casts leaves to the target dtype.
    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, jnp.bfloat16)  # noqa: E731
        return (optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params)), optax.EmptyState())

    def update(grads, opt_states, params=None):
        del params
        opt_state = opt_states[0]
        c = opt_state.count + 1
        bc1 = 1.0 - b1 ** c.astype(jnp.float32)
        bc2 = 1.0 - b2 ** c.astype(jnp.float32)

        def one(g, m, v):
            g = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
            upd = (-learning_rate) * (m32 / bc1) / (
                jnp.sqrt(v32 / bc2) + eps)
            return upd, m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)

        flat, tdef = jax.tree_util.tree_flatten(grads)
        mus = tdef.flatten_up_to(opt_state.mu)
        nus = tdef.flatten_up_to(opt_state.nu)
        out = [one(g, m, v) for g, m, v in zip(flat, mus, nus)]
        updates = tdef.unflatten([o[0] for o in out])
        new_state = optax.ScaleByAdamState(
            count=c,
            mu=tdef.unflatten([o[1] for o in out]),
            nu=tdef.unflatten([o[2] for o in out]))
        return updates, (new_state, optax.EmptyState())

    return optax.GradientTransformation(init, update)


class GANTrainState(struct.PyTreeNode):
    params_G: Any
    stats_G: Any
    params_D: Any
    stats_D: Any
    opt_G: Any
    opt_D: Any
    step: jnp.ndarray


def _models(config: GANTrainConfig) -> tuple[Generator, Discriminator]:
    # g_fuse='train' additionally routes the TRAINING generator's 3x3 convs
    # through the fused Pallas kernel where shapes qualify (measured
    # neutral-to-slightly-negative at the reference train workload: 374.9
    # vs ~394 patches/s, tools/ab_g_fuse.py — so off by default; eval
    # defaults ON in generator_forward below, where it measured +19%).
    return (
        Generator(factor=config.factor,
                  residual_blocks_count=config.residual_blocks_count,
                  dtype=config.dtype, auto_fuse=config.g_fuse == "train",
                  fusion=config.conv_fusion),
        Discriminator(dtype=config.dtype),
    )


def create_gan_state(
    key: jax.Array,
    config: GANTrainConfig,
    learning_rate: float,
    params_G=None,
    stats_G=None,
    params_D=None,
    stats_D=None,
) -> GANTrainState:
    """Init models (or adopt given params) with fresh Adam optimizers."""
    g, d = _models(config)
    kg, kd = jax.random.split(key)
    lr_patch = config.hr_patch // config.factor
    if params_G is None:
        vg = g.init(kg, jnp.zeros((1, lr_patch, lr_patch, 3)))
        params_G, stats_G = vg["params"], vg["batch_stats"]
    if params_D is None:
        vd = d.init(kd, jnp.zeros((1, config.hr_patch, config.hr_patch, 3)))
        params_D, stats_D = vd["params"], vd["batch_stats"]
    if config.d_params == "bf16":
        # f32 moment math is mandatory when params are bf16 (see d_params)
        assert config.d_moments == "bf16", \
            "d_params='bf16' requires d_moments='bf16' (f32 update math)"
    params_D = _cast_large_d_params(params_D, config.d_params)
    tx_g = _adam(learning_rate)
    tx_d = _adam(learning_rate, config.d_moments)
    return GANTrainState(
        params_G=params_G, stats_G=stats_G,
        params_D=params_D, stats_D=stats_D,
        opt_G=tx_g.init(params_G), opt_D=tx_d.init(params_D),
        step=jnp.zeros((), jnp.int32),
    )


def _train_step_core(
    state: GANTrainState,
    lr_patches: jnp.ndarray,
    hr_patches: jnp.ndarray,
    config: GANTrainConfig,
    learning_rate: float,  # static — optimizers are built here (see _adam)
    content_loss: Callable,
):
    """One adversarial step (do_epoch parity, train_GAN.py:38-71).

    lr_patches: (B, p, p, 3) in [0,1]; hr_patches: (B, P, P, 3) in [-1,1].
    Returns (new_state, {'loss_D', 'loss_G'}).
    """
    g, d = _models(config)
    tx_G = _adam(learning_rate)
    tx_D = _adam(learning_rate, config.d_moments)

    def g_apply(p, st, x, train=True):
        out, upd = g.apply({"params": p, "batch_stats": st}, x, train,
                           mutable=["batch_stats"])
        return out, upd["batch_stats"]

    def d_apply(p, st, x, train=True):
        out, upd = d.apply({"params": p, "batch_stats": st}, x, train,
                           mutable=["batch_stats"])
        return out, upd["batch_stats"]

    # Note (measured, DESIGN.md "the folding family verdict"): whole-D /
    # whole-G zero-seam folded Pallas dataflows and per-conv batch folding
    # were built, hardware-validated, and A/B'd at this step's reference
    # workload — every variant LOST to the XLA batched convs (best folded D
    # 259 vs 395 patches/s) and was pruned. The records live in DESIGN.md;
    # the code is in git history (round-3 tags).

    # --- One generator forward, linearized (train_GAN.py:41 computes
    # `fake` ONCE per step and reuses it for both the D update and the G
    # loss; the single BN batch-stats update happens here). Running the
    # forward twice (as a naive grad-of-loss formulation does) both doubles
    # the G forward cost — XLA cannot CSE the two applications because their
    # stat-update expressions differ — and applies the BN momentum update
    # twice per step, diverging from the reference's stats trajectory. ---
    def g_fwd(pg):
        return g_apply(pg, state.stats_G, lr_patches)

    fake, g_vjp, stats_G = jax.vjp(g_fwd, state.params_G, has_aux=True)

    # --- Discriminator update (train_GAN.py:43-53) ---
    fake_d = jax.lax.stop_gradient(fake)

    # The real and fake batches run through D as ONE batch-2B application
    # with per-group BN statistics (models/srgan.py stat_groups) — exactly
    # the reference's two sequential calls (stats order preserved via the
    # composed momentum update), but every conv/GEMM streams its weights
    # once and the backward emits one wgrad per layer instead of two.
    # config.d_concat=False restores the sequential two-call form (A/B hook).
    def loss_D_fn(pd):
        if config.d_concat:
            b = hr_patches.shape[0]
            both = jnp.concatenate(
                [hr_patches, fake_d.astype(hr_patches.dtype)], axis=0)
            logits, st2 = d.apply(
                {"params": pd, "batch_stats": state.stats_D}, both, True,
                2, mutable=["batch_stats"])
            real_logits, fake_logits = logits[:b], logits[b:]
            return (L.discriminator_loss(real_logits, fake_logits),
                    st2["batch_stats"])
        real_logits, st1 = d_apply(pd, state.stats_D, hr_patches)
        fake_logits, st2 = d_apply(pd, st1, fake_d)
        return L.discriminator_loss(real_logits, fake_logits), st2

    # Note (measured, DESIGN.md "the fused dense-head verdict"): a Pallas
    # kernel fusing dense1's backward + Adam into one weight pass (gradient
    # never materialized in HBM) was built, pinned vs autodiff+optax, and
    # A/B'd at this step — it LOST decisively (396-408 vs 460-462 patches/s)
    # and was pruned; record in DESIGN.md, code in git history (round-4).
    (loss_D, stats_D), grads_D = jax.value_and_grad(
        loss_D_fn, has_aux=True)(state.params_D)
    upd_D, opt_D = tx_D.update(grads_D, state.opt_D, state.params_D)
    params_D = optax.apply_updates(state.params_D, upd_D)

    # --- Generator update (train_GAN.py:55-64): differentiate the loss
    # w.r.t. the fake IMAGES, then pull the cotangent back through the
    # saved generator linearization — one G forward + one G transpose
    # per step instead of two forwards + one transpose. ---
    def loss_from_fake(fk):
        adv_input = jax.lax.stop_gradient(fk) if config.legacy_detach else fk
        # D runs in train mode on the fake batch but its stats are not
        # persisted here (the reference's third D stat update is dropped —
        # the D optimizer has already consumed this step's statistics).
        fake_logits, _ = d_apply(params_D, stats_D, adv_input)
        return L.perceptual_loss(content_loss, fk, hr_patches, fake_logits,
                                 adv_weight=config.adv_weight)

    loss_G, dfake = jax.value_and_grad(loss_from_fake)(fake)
    (grads_G,) = g_vjp(dfake)
    upd_G, opt_G = tx_G.update(grads_G, state.opt_G, state.params_G)
    params_G = optax.apply_updates(state.params_G, upd_G)

    new_state = GANTrainState(
        params_G=params_G, stats_G=stats_G,
        params_D=params_D, stats_D=stats_D,
        opt_G=opt_G, opt_D=opt_D,
        step=state.step + 1,
    )
    return new_state, {"loss_D": loss_D, "loss_G": loss_G}


@partial(jax.jit, static_argnames=("config", "learning_rate", "content_loss"))
def gan_train_step(
    state: GANTrainState,
    lr_patches: jnp.ndarray,
    hr_patches: jnp.ndarray,
    config: GANTrainConfig,
    learning_rate: float,
    content_loss: Callable = L.mse,
):
    """Single dispatched adversarial step (see _train_step_core)."""
    return _train_step_core(state, lr_patches, hr_patches, config,
                            learning_rate, content_loss)


@partial(jax.jit, static_argnames=("config", "train"))
def generator_forward(
    params_G, stats_G, lr_images: jnp.ndarray, config: GANTrainConfig,
    train: bool = False,
):
    """Full-image generator inference (eval_GAN.py:44).

    ``train=False`` uses running BN statistics (the reference calls
    gan_G.eval() at eval_GAN.py:94).
    """
    g, _ = _models(config)
    if train:
        out, _ = g.apply({"params": params_G, "batch_stats": stats_G},
                         lr_images, True, mutable=["batch_stats"])
        return out
    # Eval routes the generator's 3x3 convs through the fused Pallas kernel
    # BY DEFAULT where shapes qualify (batch-1 full-image; measured on
    # hardware: 96.7 vs 81.4 MPix/s on the x8 eval bench, tools/ab_g_fuse.py
    # — the fully-chained variant measured 93.7 and was pruned). Per-conv
    # routing still gates on fused_conv_available/_supported inside Conv,
    # so CPU and unsupported shapes fall back to the XLA path.
    # config.g_fuse='off' opts out (e.g. to A/B, or under spatial shard_map
    # where the per-shard shapes may not benefit); the param tree is
    # identical either way.
    if config.g_fuse != "off" and not g.auto_fuse:
        g = Generator(factor=config.factor,
                      residual_blocks_count=config.residual_blocks_count,
                      dtype=config.dtype, auto_fuse=True,
                      fusion=config.conv_fusion)
    return g.apply({"params": params_G, "batch_stats": stats_G},
                   lr_images, False)
