"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-host test strategy mandated by SURVEY.md §4: sharding
logic is validated on fake CPU devices, matching how the driver dry-runs
the multi-chip path.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
