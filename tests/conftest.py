"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests use XLA's
host-platform device-count override, the JAX analogue of a fake
distributed backend.

Note: the environment's axon TPU plugin (sitecustomize in /root/.axon_site)
registers itself regardless of JAX_PLATFORMS, so the platform must be
forced through jax.config *after* import.
"""

import os

# The persistent-cache AOT loader logs a full CPU-feature dump per cache hit
# ("+prefer-no-scatter is not supported..." — XLA tuning flags misread as
# CPU features); at 100s of hits it drowns real failures in test output.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The suite's wall clock is dominated by XLA compiles: every Engine builds
# fresh jit closures, so identical-config engines recompile identical HLO.
# The persistent compilation cache dedupes those compiles both within one
# pytest run (2nd+ engine with the same cfg deserializes instead of
# compiling) and across runs on the same box.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
