"""Test harness config: force CPU backend with 8 virtual devices.

This is the JAX-idiomatic "fake multi-node backend" (SURVEY.md §4): sharding,
shard_map collectives and halo exchange are exercised on an 8-device host mesh
without TPU hardware.

Note: the TPU PJRT plugin in this image ignores the JAX_PLATFORMS env var, so
we force the platform through jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A single `pytest tests/ -q` invocation accumulates hundreds of XLA CPU
    executables across ~150 tests on the 8-virtual-device mesh; the round-3
    suite segfaulted inside `backend_compile_and_load` at ~90% from that
    accumulated compile-cache/memory pressure (VERDICT r3 weak #2) while every
    file group passed in isolation. Clearing per module keeps each module's
    intra-module reuse (fixtures, repeated applies) but caps the process-wide
    live-executable set at one module's worth.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
