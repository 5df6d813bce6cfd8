"""GAN engine smoke tests: finite losses, parameter movement, determinism,
legacy-detach parity flag, and eval-mode forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.engine.gan import (
    GANTrainConfig,
    create_gan_state,
    gan_train_step,
    generator_forward,
)

CFG = GANTrainConfig(factor=4, batch_size=2, hr_patch=32, residual_blocks_count=2)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.random((2, 8, 8, 3)).astype(np.float32)          # [0,1]
    hr = (rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1  # [-1,1]
    return jnp.asarray(lr), jnp.asarray(hr)


def test_train_step_finite_and_updates_params():
    state = create_gan_state(jax.random.key(0), CFG, 1e-4)
    lr, hr = _batch()
    new_state, logs = gan_train_step(state, lr, hr, CFG, 1e-4)
    assert np.isfinite(float(logs["loss_D"]))
    assert np.isfinite(float(logs["loss_G"]))
    # both models' params moved
    d0 = jax.tree.leaves(state.params_G)[0]
    d1 = jax.tree.leaves(new_state.params_G)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    g0 = jax.tree.leaves(state.params_D)[0]
    g1 = jax.tree.leaves(new_state.params_D)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert int(new_state.step) == 1


def test_multiple_steps_losses_finite():
    state = create_gan_state(jax.random.key(1), CFG, 1e-4)
    for i in range(4):
        lr, hr = _batch(seed=i)
        state, logs = gan_train_step(state, lr, hr, CFG, 1e-4)
        assert np.isfinite(float(logs["loss_D"]))
        assert np.isfinite(float(logs["loss_G"]))


def test_legacy_detach_blocks_adversarial_gradient():
    """With legacy_detach, G's gradient is the pure content gradient."""
    cfg_fix = CFG
    cfg_leg = GANTrainConfig(**{**CFG.__dict__, "legacy_detach": True})
    lr, hr = _batch()

    state = create_gan_state(jax.random.key(2), cfg_fix, 1e-4)
    s_fix, logs_fix = gan_train_step(state, lr, hr, cfg_fix, 1e-4)
    s_leg, logs_leg = gan_train_step(state, lr, hr, cfg_leg, 1e-4)

    # same losses (the loss VALUE is identical; only gradients differ)...
    assert abs(float(logs_fix["loss_G"]) - float(logs_leg["loss_G"])) < 1e-5
    # ...but different G updates
    f = jax.tree.leaves(s_fix.params_G)
    l = jax.tree.leaves(s_leg.params_G)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(f, l))


def test_generator_eval_forward_full_image():
    state = create_gan_state(jax.random.key(3), CFG, 1e-4)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 24, 3)), jnp.float32)
    y = generator_forward(state.params_G, state.stats_G, x, CFG, train=False)
    assert y.shape == (1, 64, 96, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_adv_weight_scales_adversarial_term():
    """adv_weight=0 == pure content training; the G loss gap between
    weight 0 and 1 is exactly the adversarial BCE (losses.perceptual_loss)."""
    import dataclasses

    from tpusr.engine import losses as L

    lr, hr = _batch()
    cfg0 = dataclasses.replace(CFG, adv_weight=0.0)
    state = create_gan_state(jax.random.key(0), CFG, 1e-4)
    _, logs1 = gan_train_step(state, lr, hr, CFG, 1e-4)
    _, logs0 = gan_train_step(state, lr, hr, cfg0, 1e-4)
    gap = float(logs1["loss_G"] - logs0["loss_G"])
    assert gap > 0  # BCE(fake, ones) is strictly positive
    # weight 0.5 sits exactly halfway
    cfg_h = dataclasses.replace(CFG, adv_weight=0.5)
    _, logs_h = gan_train_step(state, lr, hr, cfg_h, 1e-4)
    np.testing.assert_allclose(float(logs_h["loss_G"] - logs0["loss_G"]),
                               gap / 2, rtol=1e-4)


def test_g_fuse_route_matches_default():
    """Eval routes the G's 3x3 convs through the fused kernel BY DEFAULT on
    qualifying shapes (conv_fusion='interpret' exercising the kernel on
    CPU); the output must match the g_fuse='off' banded-XLA path.
    g_fuse='train' additionally fuses the training generator. Routing lives
    in hashable config fields, so the two routes are distinct jit cache
    entries — no clear_cache needed."""
    import dataclasses

    from tpusr.engine.gan import _models, generator_forward

    cfg = GANTrainConfig(factor=4, residual_blocks_count=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)

    cfg_off = dataclasses.replace(cfg, g_fuse="off")
    g0, _ = _models(cfg_off)
    v = g0.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    want = generator_forward(v["params"], v["batch_stats"], x, cfg_off)

    cfg_fuse = dataclasses.replace(cfg, g_fuse="eval",
                                   conv_fusion="interpret")
    got = generator_forward(v["params"], v["batch_stats"], x, cfg_fuse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    cfg_train = dataclasses.replace(cfg, g_fuse="train",
                                    conv_fusion="interpret")
    g1, _ = _models(cfg_train)
    assert g1.auto_fuse
    got_t, _ = g1.apply(v, x, True, mutable=["batch_stats"])
    want_t, _ = g0.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-4, atol=2e-4)


def test_d_concat_matches_sequential_calls(monkeypatch):
    """stat_groups=2 over concat(real, fake) must equal the reference's two
    sequential D applications (train_GAN.py:44-48): identical logits and
    identical post-step running statistics (composed momentum update)."""
    from tpusr.models.srgan import Discriminator

    d = Discriminator()
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(0, 0.5, (4, 32, 32, 3)), jnp.float32)
    fake = jnp.asarray(rng.normal(0, 0.5, (4, 32, 32, 3)), jnp.float32)
    v = d.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    p, st = v["params"], v["batch_stats"]

    rl, u1 = d.apply({"params": p, "batch_stats": st}, real, True,
                     mutable=["batch_stats"])
    fl, u2 = d.apply({"params": p, "batch_stats": u1["batch_stats"]}, fake,
                     True, mutable=["batch_stats"])
    bl, uc = d.apply({"params": p, "batch_stats": st},
                     jnp.concatenate([real, fake], 0), True, 2,
                     mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(jnp.concatenate([rl, fl], 0)),
                               np.asarray(bl), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(u2["batch_stats"]),
                    jax.tree.leaves(uc["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_d_concat_step_matches_sequential_step():
    """The concat-D train step (d_concat=True, default) must produce the
    same losses and D running stats as the sequential two-call form.
    Post-Adam params are NOT compared: D gradients at random init amplify
    f32 reduction reassociation chaotically (measured; DESIGN.md 'random-init
    D gradients are chaotic'). d_concat is a config field (static jit arg),
    so the two routes are distinct cache entries — no clear_cache needed."""
    import dataclasses

    lr, hr = _batch()
    # strict route-equality property: pin f32 D weights (the routed bf16
    # default stores wide-conv weights bf16, which moves the seq-vs-concat
    # agreement from f32 to bf16 roundoff)
    cfg32 = dataclasses.replace(CFG, d_params="f32")
    state = create_gan_state(jax.random.key(7), cfg32, 1e-4)

    cfg_seq = dataclasses.replace(cfg32, d_concat=False)
    cfg_cat = dataclasses.replace(cfg32, d_concat=True)
    s_seq, logs_seq = gan_train_step(state, lr, hr, cfg_seq, 1e-4)
    s_cat, logs_cat = gan_train_step(state, lr, hr, cfg_cat, 1e-4)

    assert abs(float(logs_seq["loss_D"]) - float(logs_cat["loss_D"])) < 1e-5
    assert abs(float(logs_seq["loss_G"]) - float(logs_cat["loss_G"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s_seq.stats_D),
                    jax.tree.leaves(s_cat.stats_D)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_bf16_adam_moments_match_f32_updates():
    """_adam('bf16') stores both moments in bfloat16 but must track plain
    optax.adam closely: same update math in f32, only the moment STORAGE is
    rounded. 20 steps on a deterministic quadratic stay within bf16's ~0.4%
    relative storage error envelope."""
    import optax

    from tpusr.engine.gan import _adam

    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8)}
    target = jnp.ones((8, 8)) * 0.3

    tx32, tx16 = _adam(1e-2), _adam(1e-2, "bf16")
    s32, s16 = tx32.init(params), tx16.init(params)
    assert jax.tree.leaves(s16)[1].dtype == jnp.bfloat16  # mu leaf

    p32 = p16 = params
    for _ in range(20):
        g32 = jax.grad(lambda p: jnp.mean((p["w"] - target) ** 2))(p32)
        g16 = jax.grad(lambda p: jnp.mean((p["w"] - target) ** 2))(p16)
        u32, s32 = tx32.update(g32, s32, p32)
        u16, s16 = tx16.update(g16, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    # params themselves stay f32 and the trajectories agree to ~1e-3 of the
    # lr-scale step magnitude
    assert p16["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               atol=2e-3)


def test_train_step_with_bf16_d_moments():
    """d_moments='bf16' is the DEFAULT (round 4, +6% measured, PARITY.md):
    D moments stored bf16, G moments stay f32, full step runs end-to-end
    with finite losses; 'f32' opt-out restores plain optax state dtypes."""
    import dataclasses

    cfg = CFG
    assert cfg.d_moments == "bf16"  # the routed default
    s_f32 = create_gan_state(
        jax.random.key(4),
        dataclasses.replace(cfg, d_moments="f32", d_params="f32"), 1e-4)
    assert all(getattr(l, "dtype", None) != jnp.bfloat16
               for l in jax.tree.leaves(s_f32.opt_D))
    state = create_gan_state(jax.random.key(4), cfg, 1e-4)
    d_mu_leaves = jax.tree.leaves(state.opt_D)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in d_mu_leaves)
    g_mu_leaves = jax.tree.leaves(state.opt_G)
    assert all(getattr(l, "dtype", None) != jnp.bfloat16 for l in g_mu_leaves)

    lr, hr = _batch()
    new_state, logs = gan_train_step(state, lr, hr, cfg, 1e-4)
    assert np.isfinite(float(logs["loss_D"]))
    assert np.isfinite(float(logs["loss_G"]))
    d0 = jax.tree.leaves(state.params_D)[0]
    d1 = jax.tree.leaves(new_state.params_D)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_train_step_with_bf16_d_params():
    """d_params='bf16' (the ROUTED default since its round-5 full-step A/B
    win, docs/evidence_r5/ab_d_params.log): LARGE D weights stored bf16
    (dense1 + wide convs), small leaves (BN affines, biases) stay f32,
    update math f32 via apply_updates' cast-back; the step runs with finite
    losses in the same ballpark as the explicit --d_params f32 run, and the
    .pth export is f32 numpy."""
    import dataclasses

    from tpusr.io.checkpoint import export_torch_discriminator

    cfg = dataclasses.replace(CFG, d_params="bf16")
    cfg32 = dataclasses.replace(CFG, d_params="f32")
    state = create_gan_state(jax.random.key(4), cfg, 1e-4)
    assert state.params_D["dense1"]["Dense_0"]["kernel"].dtype == jnp.bfloat16
    assert state.params_D["dense1"]["Dense_0"]["bias"].dtype == jnp.float32
    assert state.params_D["block0_bn"]["scale"].dtype == jnp.float32
    # G untouched
    assert all(l.dtype != jnp.bfloat16
               for l in jax.tree.leaves(state.params_G))

    lr, hr = _batch()
    s_bf, logs_bf = gan_train_step(state, lr, hr, cfg, 1e-4)
    assert s_bf.params_D["dense1"]["Dense_0"]["kernel"].dtype == jnp.bfloat16

    s32 = create_gan_state(jax.random.key(4), cfg32, 1e-4)
    assert s32.params_D["dense1"]["Dense_0"]["kernel"].dtype == jnp.float32
    _, logs_32 = gan_train_step(s32, lr, hr, cfg32, 1e-4)
    for k in ("loss_D", "loss_G"):
        assert np.isfinite(float(logs_bf[k]))
        # same init quantized to bf16: first-step losses agree loosely
        np.testing.assert_allclose(float(logs_bf[k]), float(logs_32[k]),
                                   rtol=0.05)

    sd = export_torch_discriminator(s_bf.params_D, s_bf.stats_D,
                                    hr_patch=cfg.hr_patch)
    assert all(v.dtype == np.float32 for k, v in sd.items()
               if "num_batches_tracked" not in k)


def test_resume_across_moment_dtypes(tmp_path):
    """A checkpoint written with f32 D moments (pre-round-4 default) resumes
    into a bf16-moment state: load_checkpoint casts leaves to the target's
    dtypes, values survive within bf16 rounding, and the step runs."""
    import dataclasses

    from tpusr.io.checkpoint import load_checkpoint, save_checkpoint

    cfg32 = dataclasses.replace(CFG, d_moments="f32", d_params="f32")
    s32 = create_gan_state(jax.random.key(7), cfg32, 1e-4)
    # one step so the moments are non-zero
    lr, hr = _batch()
    s32, _ = gan_train_step(s32, lr, hr, cfg32, 1e-4)
    save_checkpoint(str(tmp_path / "ckpt"), s32)

    target = create_gan_state(jax.random.key(0), CFG, 1e-4)  # bf16 moments
    restored = load_checkpoint(str(tmp_path / "ckpt"), target=target)
    for r, t in zip(jax.tree.leaves(restored.opt_D),
                    jax.tree.leaves(target.opt_D)):
        assert r.dtype == t.dtype
    # a float32 source moment survives the cast within bf16 rounding
    src = jax.tree.leaves(s32.opt_D)
    got = jax.tree.leaves(restored.opt_D)
    for s, g in zip(src, got):
        np.testing.assert_allclose(np.asarray(s, np.float32),
                                   np.asarray(g, np.float32),
                                   rtol=8e-3, atol=1e-8)
    new_state, logs = gan_train_step(restored, lr, hr, CFG, 1e-4)
    assert np.isfinite(float(logs["loss_D"]))
