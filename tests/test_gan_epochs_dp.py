"""Data-parallel on-device epochs: GSPMD-sharded patch batch must match the
single-device trainer (same keys) up to float reduction noise."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpusr.engine.gan import GANTrainConfig, create_gan_state
from tpusr.engine.gan_epochs import gan_train_epochs
from tpusr.parallel.mesh import make_mesh

CFG = GANTrainConfig(factor=4, batch_size=8, hr_patch=32,
                     residual_blocks_count=2)


def test_dp_epochs_match_single_device():
    rng = np.random.default_rng(0)
    n = 8
    lr = jnp.asarray(rng.integers(0, 256, (n, 20, 24, 3), dtype=np.uint8))
    hr = jnp.asarray(rng.integers(0, 256, (n, 80, 96, 3), dtype=np.uint8))
    valid = jnp.asarray(np.tile([[20, 24]], (n, 1)), jnp.int32)
    state = create_gan_state(jax.random.key(0), CFG, 1e-4)

    s_ref, l_ref = gan_train_epochs(state, lr, hr, valid, jax.random.key(1),
                                    CFG, 1e-4, n_epochs=2)

    mesh = make_mesh({"data": 8})
    repl = NamedSharding(mesh, P())
    s_dp, l_dp = gan_train_epochs(
        jax.device_put(state, repl), jax.device_put(lr, repl),
        jax.device_put(hr, repl), jax.device_put(valid, repl),
        jax.random.key(1), CFG, 1e-4, n_epochs=2, mesh=mesh)

    np.testing.assert_allclose(np.asarray(l_dp["losses_G"]),
                               np.asarray(l_ref["losses_G"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(l_dp["losses_D"]),
                               np.asarray(l_ref["losses_D"]), atol=2e-3)
    for a, b in zip(jax.tree.leaves(s_ref.params_G),
                    jax.tree.leaves(s_dp.params_G)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
