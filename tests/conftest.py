"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Mirrors the reference's lack of GPU-requirement in tests by running all
kernel/module tests on the CPU backend; distributed tests shard over the 8
virtual devices (SURVEY.md §4d).

This image auto-registers the experimental axon TPU plugin from a
sitecustomize hook (PYTHONPATH=/root/.axon_site) in every interpreter, and
that registration wins over ``JAX_PLATFORMS=cpu``.  sitecustomize runs
before conftest, so we deregister the factory and switch the platform via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: this box has 1 CPU and XLA compiles dominate
# test wall-clock; the cache makes re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier (subprocess CLI end-to-end tests)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: slow tier (full subprocess train/eval CLI runs)"
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast signal tier (ops oracles + flagship model + loss twin); "
        "run with `-m smoke`",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
