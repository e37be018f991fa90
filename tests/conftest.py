"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Mirrors the reference's lack of GPU-requirement in tests by running all
kernel/module tests on the CPU backend; distributed tests shard over the 8
virtual devices (SURVEY.md §4d).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
