"""Test-wide JAX setup: run everything on a virtual 8-device CPU mesh unless a
test explicitly opts into the real backend (VPC_TEST_REAL_DEVICE=1).

Must set env BEFORE jax is imported anywhere (reference test strategy analog:
SURVEY.md §4 — kernel tests compare Pallas vs jnp on the CPU backend;
multi-device sharding tests use xla_force_host_platform_device_count).
"""

import os

if os.environ.get("VPC_TEST_REAL_DEVICE") != "1":
    # Force, don't setdefault: the machine environment pre-sets
    # JAX_PLATFORMS to the TPU platform, and sitecustomize may import jax
    # before this file runs — so set both the env var and the live config.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def evict_config():
    from vllm_paged_compression_tpu.config import PagedEvictConfig
    return PagedEvictConfig(enabled=True, evict_method="streamingLLM",
                            cache_budget=64)
