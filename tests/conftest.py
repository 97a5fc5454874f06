"""Test configuration: CPU backend with 8 virtual devices, float64.

The correctness tier mirrors the reference (CPU, double precision, 1e-10
tolerances); an 8-device virtual CPU mesh validates the multi-chip sharding
path without TPU hardware.

Note: under the axon TPU plugin ``JAX_PLATFORMS=cpu`` is ignored for the
*default backend*, but CPU devices are always present — so we route via
``jax_default_device`` instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", "cpu")

# Persistent compilation cache: XLA:CPU compiles the whole-program solver
# and implicit-derivative executables slowly on single-core hosts; caching
# them makes every suite run after the first start in seconds.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
