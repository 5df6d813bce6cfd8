"""Fused dense-head backward+Adam (ops/pallas_head.py, interpret mode on
CPU) — kernel vs closed form, closed form vs optax, and the restructured
d_head_fused train step vs the stock value_and_grad step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tpusr.ops.pallas_head import head_bwd_adam, head_bwd_adam_reference


def _problem(K=1024, N=256, B=16, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(0, 0.02, (K, N)), jnp.float32)
    m = jnp.asarray(rng.normal(0, 1e-4, (K, N)), jnp.float32)
    v = jnp.asarray(rng.random((K, N)) * 1e-6, jnp.float32)
    feats = jnp.asarray(rng.normal(0, 1.0, (B, K)), dtype)
    dy = jnp.asarray(rng.normal(0, 1e-2, (B, N)), jnp.float32)
    return w, m, v, feats, dy


@pytest.mark.parametrize("mdtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(mdtype):
    w, m, v, feats, dy = _problem()
    m, v = m.astype(mdtype), v.astype(mdtype)
    count = jnp.asarray(3, jnp.int32)
    out_k = head_bwd_adam(w, m, v, feats, dy, count, 1e-4, interpret=True)
    out_r = head_bwd_adam_reference(w, m, v, feats, dy, count, 1e-4)
    # per-tile vs whole-K f32 accumulation differs at ~1e-7 rel; outputs
    # stored in bf16 can land 1 ulp apart (ulp ~= |x|/256) — tolerate that
    for a, b in zip(out_k, out_r):
        assert a.dtype == b.dtype and a.shape == b.shape
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        ulp = (np.abs(bf) / 128 + 1e-9 if a.dtype == jnp.bfloat16
               else np.abs(bf) * 1e-5 + 1e-8)
        assert (np.abs(af - bf) <= ulp).all(), np.abs(af - bf).max()


def test_reference_matches_optax_adam():
    """The in-kernel Adam closed form == optax.adam (scale_by_adam +
    scale(-lr)) stepped from the same (count, mu, nu)."""
    w, m, v, feats, dy = _problem(K=512, N=128, B=8)
    count = jnp.asarray(7, jnp.int32)

    # head_bwd_adam takes the POST-increment count (optax increments its
    # stored count before bias-correcting)
    _, w2, m2, v2 = head_bwd_adam_reference(w, m, v, feats, dy, count + 1, 1e-3)

    g = jax.lax.dot_general(feats, dy.astype(feats.dtype),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    tx = optax.adam(1e-3)
    state = (optax.ScaleByAdamState(count=count, mu={"k": m}, nu={"k": v}),
             optax.EmptyState())
    upd, new_state = tx.update({"k": g}, state, {"k": w})
    w2_opt = optax.apply_updates({"k": w}, upd)["k"]
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w2_opt),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(new_state[0].mu["k"]),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(new_state[0].nu["k"]),
                               rtol=1e-6, atol=1e-15)


def test_manual_head_backward_matches_autodiff():
    """The closed-form head cotangents in engine/gan._d_update_fused (BCE ->
    dense2 -> LeakyReLU -> dense1) == jax.grad of the same head, on fixed
    weights (no BN chaos — the head has none)."""
    from tpusr.engine import losses as L
    from tpusr.models.layers import leaky_relu

    rng = np.random.default_rng(1)
    B2, K, H = 8, 512, 64
    b = B2 // 2
    feats = jnp.asarray(rng.normal(0, 1, (B2, K)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (K, H)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.01, (H,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (H, 1)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.01, (1,)), jnp.float32)

    def head_loss(w1_, b1_, w2_, b2_, f):
        y1 = f @ w1_ + b1_
        a1 = leaky_relu(y1, 0.2)
        logits = a1 @ w2_ + b2_
        return L.discriminator_loss(logits[:b], logits[b:])

    gw1, gb1, gw2, gb2, gf = jax.grad(head_loss, argnums=(0, 1, 2, 3, 4))(
        w1, b1, w2, b2, feats)

    # closed form (mirrors _d_update_fused)
    y1 = feats @ w1 + b1
    a1 = leaky_relu(y1, 0.2)
    logits = a1 @ w2 + b2
    sig = jax.nn.sigmoid(logits)
    targets = jnp.concatenate([jnp.ones((b, 1)), jnp.zeros((b, 1))], axis=0)
    dlogits = (sig - targets) / b
    dw2 = a1.T @ dlogits
    db2 = jnp.sum(dlogits, axis=0)
    da1 = dlogits @ w2.T
    dy1 = jnp.where(y1 > 0, da1, 0.2 * da1)
    db1 = jnp.sum(dy1, axis=0)
    dw1 = feats.T @ dy1
    df = dy1 @ w1.T

    for got, want in [(dw1, gw1), (db1, gb1), (dw2, gw2), (db2, gb2),
                      (df, gf)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-8)


def test_fused_step_matches_stock_step():
    """gan_train_step with d_head_fused (kernel in interpret mode) must
    reproduce the stock step's losses and D running stats. Post-Adam params
    are compared only for the G (identical by construction); D params go
    through Adam where reduction-order noise on near-zero grads becomes a
    full ±lr step (DESIGN.md 'random-init D gradients are chaotic')."""
    from tpusr.engine.gan import GANTrainConfig, create_gan_state, gan_train_step

    cfg = GANTrainConfig(factor=4, batch_size=4, hr_patch=32,
                         residual_blocks_count=2)
    cfg_fused = dataclasses.replace(cfg, d_head_fused=True,
                                    conv_fusion="interpret")
    rng = np.random.default_rng(0)
    lr_p = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    hr_p = jnp.asarray(rng.random((4, 32, 32, 3)) * 2 - 1, jnp.float32)

    state = create_gan_state(jax.random.key(7), cfg, 1e-4)
    s0, logs0 = gan_train_step(state, lr_p, hr_p, cfg, 1e-4)
    s1, logs1 = gan_train_step(state, lr_p, hr_p, cfg_fused, 1e-4)

    assert abs(float(logs0["loss_D"]) - float(logs1["loss_D"])) < 1e-5
    assert abs(float(logs0["loss_G"]) - float(logs1["loss_G"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s0.stats_D), jax.tree.leaves(s1.stats_D)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # G grads flow THROUGH the updated D, where reduction-order noise on
    # near-zero D grads becomes a full ±lr Adam step (DESIGN.md chaos note),
    # so G params agree only to the Adam step scale
    for a, b in zip(jax.tree.leaves(s0.params_G), jax.tree.leaves(s1.params_G)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 2 * 1e-4 + 1e-7
    # dense1 kernel: same gradient up to f32 reduction order -> same Adam
    # step direction; |delta| is bounded by lr
    d0 = np.asarray(s0.params_D["dense1"]["Dense_0"]["kernel"])
    d1 = np.asarray(s1.params_D["dense1"]["Dense_0"]["kernel"])
    assert np.abs(d0 - d1).max() <= 2 * 1e-4 + 1e-7
    # and the step actually moved the weight
    w0 = np.asarray(state.params_D["dense1"]["Dense_0"]["kernel"])
    assert np.abs(d1 - w0).max() > 1e-6


def test_fused_step_bf16_moments_and_activations():
    """d_head_fused composes with d_moments='bf16' and bf16 activations."""
    from tpusr.engine.gan import GANTrainConfig, create_gan_state, gan_train_step

    cfg = GANTrainConfig(factor=4, batch_size=4, hr_patch=32,
                         residual_blocks_count=2, dtype="bfloat16",
                         d_moments="bf16", d_head_fused=True,
                         conv_fusion="interpret")
    rng = np.random.default_rng(3)
    lr_p = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    hr_p = jnp.asarray(rng.random((4, 32, 32, 3)) * 2 - 1, jnp.float32)
    state = create_gan_state(jax.random.key(2), cfg, 1e-4)
    s1, logs = gan_train_step(state, lr_p, hr_p, cfg, 1e-4)
    assert np.isfinite(float(logs["loss_D"]))
    assert np.isfinite(float(logs["loss_G"]))
    mu = s1.opt_D.mu["dense1"]["Dense_0"]["kernel"]
    assert mu.dtype == jnp.bfloat16
    assert int(s1.opt_D.count) == 1
