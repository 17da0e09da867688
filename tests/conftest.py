"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference (ishine/chunkformer) has no multi-device tests at all; here every
sharding/pjit path is unit-testable on CPU with 8 simulated devices
(`--xla_force_host_platform_device_count=8`).

Note: the environment may pre-import jax with a TPU plugin platform
(JAX_PLATFORMS=axon), so env vars alone are too late — use jax.config to force
the CPU backend. XLA_FLAGS is read at backend init, which hasn't happened yet
at conftest time.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-bound; cache XLA
# executables across test runs and xdist workers.
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "chunkformer_tpu_xla")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
