"""Test bootstrap.

MUST run before anything imports jax: forces the CPU backend with 8 virtual
devices so mesh/pjit/sharding tests exercise real multi-device code paths
without TPU hardware (SURVEY.md §4 implication (d)).
"""

import os

# The image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the TPU tunnel), so env vars alone are too late.
# jax.config.update before first backend use still wins; XLA_FLAGS is read
# lazily at CPU-backend creation, so setting it here works.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("ENV", "test")
os.environ.setdefault("DATABASE_URL", "sqlite:///:memory:")
os.environ.setdefault("JWT_SECRET_KEY", "test-secret")
os.environ.setdefault("NEXTCLOUD_SYNC_INITIAL_ON_STARTUP", "false")
# app-fixture startup must not build/warm a full inference engine on CPU;
# the TPU tier has its own dedicated tests
os.environ.setdefault("TPU_ENABLE_INFERENCE", "false")
os.environ.setdefault("TPU_WARMUP_ON_STARTUP", "false")

import pytest  # noqa: E402


@pytest.fixture()
def anyio_backend():
    return "asyncio"
