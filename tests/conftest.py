"""Test configuration: force CPU JAX with 8 virtual devices so sharding tests
run anywhere (SURVEY.md §4)."""

import os

# force CPU: the environment exports JAX_PLATFORMS=axon (the tunneled TPU),
# but tests must run hermetically on virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (must configure before backend init)

try:
    # both updates are required: setting jax_platforms via config (not just
    # the env var) is what makes jax_num_cpu_devices take effect
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # backend already initialized (e.g. plugin import order)

# persistent compilation cache: the 1-core box spends minutes recompiling
# otherwise; cache entries are keyed by jaxpr so correctness is unaffected
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

# opt-in line coverage (no coverage.py in this environment): PCTPU_COV=<out.json>
_cov_out = os.environ.get("PCTPU_COV")
if _cov_out:
    from tests import covtrace

    covtrace.start()

    def pytest_sessionfinish(session, exitstatus):
        covtrace.dump(_cov_out)
