"""Test configuration: force CPU JAX with 8 virtual devices so sharding tests
run anywhere (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (must configure before backend init)

try:
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # backend already initialized (e.g. plugin import order)
