"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax initializes a backend — conftest is imported before any
test module, and the package itself only touches jax.config (safe pre-init).
Multi-chip sharding tests use the 8 virtual CPU devices as a stand-in mesh;
the driver separately dry-runs the sharded path via __graft_entry__.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# the only reliable way to force the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: test runs on this host are compile-bound.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
