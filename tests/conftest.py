"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the idiomatic JAX way to test multi-chip sharding without a cluster
(SURVEY.md §4 item 4): force the host platform and fan it out to 8 virtual
devices *before* jax initializes.
"""

import os

# NOTE: this image's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (the real-TPU tunnel), so env vars set here are too late
# for import-time config — but backends are not initialized yet, so
# jax.config.update still wins. XLA_FLAGS is read at backend init.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: unchanged test programs skip XLA recompilation
# across pytest runs (compile dominates wall time for the trainer tests).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from objgan_tpu.core.config import tiny_test_config

    return tiny_test_config()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
