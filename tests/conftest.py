"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §7
build plan step 7). Must run before jax initializes."""

import os

# Force CPU even when a TPU platform (e.g. axon) is configured in the
# environment: tests must run anywhere, and the parallel tests need 8 virtual
# devices. Benchmarks (bench.py) intentionally use the real device instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Belt and braces: if something imported jax before this conftest (a pytest
# plugin, say), the env var alone is too late — update the config explicitly
# (valid until the first backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big sharded/bootstrap programs dominate
# suite time on small hosts; cache XLA binaries across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert len(jax.devices()) >= 8, (
    "expected 8 virtual CPU devices; got " + repr(jax.devices())
)
