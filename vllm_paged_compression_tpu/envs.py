"""Central registry of every ``VPC_*`` environment variable.

TPU-native analog of the reference's ``vllm/envs.py`` (1-482): one
module documents every knob, its default, and its type; call sites use
``from . import envs`` + ``envs.NAME`` (module ``__getattr__`` reads the
environment lazily, so changes made after import — e.g. by tests — are
seen).

| variable | default | meaning |
|---|---|---|
| VPC_ATTENTION_BACKEND | "auto" | pallas | jnp | auto (jnp on CPU) |
| VPC_HBM_GIB | unset | per-chip HBM override for unlisted platforms |
| VPC_ACTIVATION_HEADROOM_MB | 1024 | HBM reserved for activations when sizing the KV pool |
| VPC_JAX_CACHE_DIR | ~/.cache/vpc_jax | persistent XLA compile cache ("0" disables) |
| VPC_PROFILE_DIR | /tmp/vpc_profile | jax.profiler trace output dir |
| VPC_WINDOW_CHAIN | unset | "1" enables pipelined window chaining (measured slower; debug) |
| VPC_NATIVE_CACHE | ~/.cache/vpc_native | compiled C++ helper (.so) cache |
| VPC_MULTIHOST_CHECK | unset | "1" turns on cross-host schedule-digest asserts |
| VPC_HTTP_READ_TIMEOUT | 300 | OpenAI server uvicorn read timeout (s) |
| VPC_HTTP_MAX_CONNECTIONS | 2048 | OpenAI server connection cap |
| VPC_LOGGING_LEVEL | INFO | vpc logger level |
| VPC_TEST_REAL_DEVICE | unset | "1" runs the test suite on the real chip instead of the CPU mesh |
| VPC_DISABLE_FUSED_LAYER | unset | "1" disables the fused decode-layer megakernel fast path |
"""

import os
from typing import Any, Callable, Dict

_SENTINEL = object()


def _str(name: str, default):
    return lambda: os.environ.get(name, default)


def _int(name: str, default: int):
    return lambda: int(os.environ.get(name, str(default)))


def _float(name: str, default: float):
    return lambda: float(os.environ.get(name, str(default)))


def _flag(name: str):
    """True iff the variable is set to exactly "1"."""
    return lambda: os.environ.get(name) == "1"


environment_variables: Dict[str, Callable[[], Any]] = {
    "VPC_ATTENTION_BACKEND": _str("VPC_ATTENTION_BACKEND", "auto"),
    # None when unset: cache_engine falls back to the platform table.
    "VPC_HBM_GIB": lambda: (
        float(os.environ["VPC_HBM_GIB"])
        if os.environ.get("VPC_HBM_GIB") else None),
    "VPC_ACTIVATION_HEADROOM_MB": _int("VPC_ACTIVATION_HEADROOM_MB", 1024),
    "VPC_JAX_CACHE_DIR": _str(
        "VPC_JAX_CACHE_DIR", os.path.expanduser("~/.cache/vpc_jax")),
    "VPC_PROFILE_DIR": _str("VPC_PROFILE_DIR", "/tmp/vpc_profile"),
    "VPC_WINDOW_CHAIN": _flag("VPC_WINDOW_CHAIN"),
    "VPC_NATIVE_CACHE": _str(
        "VPC_NATIVE_CACHE", os.path.expanduser("~/.cache/vpc_native")),
    "VPC_MULTIHOST_CHECK": _flag("VPC_MULTIHOST_CHECK"),
    "VPC_HTTP_READ_TIMEOUT": _float("VPC_HTTP_READ_TIMEOUT", 300.0),
    "VPC_HTTP_MAX_CONNECTIONS": _int("VPC_HTTP_MAX_CONNECTIONS", 2048),
    "VPC_LOGGING_LEVEL": _str("VPC_LOGGING_LEVEL", "INFO"),
    "VPC_TEST_REAL_DEVICE": _flag("VPC_TEST_REAL_DEVICE"),
    "VPC_DISABLE_FUSED_LAYER": _flag("VPC_DISABLE_FUSED_LAYER"),
}


def __getattr__(name: str):
    getter = environment_variables.get(name, _SENTINEL)
    if getter is _SENTINEL:
        raise AttributeError(f"module {__name__!r} has no attribute "
                             f"{name!r}")
    return getter()


def __dir__():
    return list(environment_variables)
