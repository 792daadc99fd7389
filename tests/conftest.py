"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-host test strategy mandated by SURVEY.md §4: sharding
logic is validated on fake CPU devices, matching how the driver dry-runs
the multi-chip path.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests must run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Something in this image pre-imports jax and pins jax_platforms to
# "axon,cpu"; the env var alone is ignored. Override the live config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if os.environ.get("GRAFT_NO_COMPCACHE"):
    # Escape hatch: this environment's persistent-cache WRITE path can
    # abort the interpreter (observed: Fatal Python error in
    # compilation_cache.put_executable_and_time during a cache-miss
    # write, killing the suite mid-run). Set GRAFT_NO_COMPCACHE=1 to
    # trade warm-start time for immunity.
    jax.config.update("jax_enable_compilation_cache", False)
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process / large compile)")
