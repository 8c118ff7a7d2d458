"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests use XLA's
host-platform device-count override, the JAX analogue of a fake
distributed backend.

Note: the environment's axon TPU plugin (sitecustomize in /root/.axon_site)
registers itself regardless of JAX_PLATFORMS, so the platform must be
forced through jax.config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
